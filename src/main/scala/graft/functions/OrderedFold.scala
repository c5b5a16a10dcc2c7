package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, RowOrdering, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** ordered_fold(arr): `arr` is an `array<struct<k, t double>>`; sort by
  * the struct's natural ascending order (key first, value second — the
  * exact ordering `array_sort` applies to a two-field struct) and fold
  * `0.0 + t_1 + t_2 + …` sequentially in that order. Null propagation
  * matches the declarative fold it replaces: a null element or a null
  * `t` makes the running sum null from that point on, hence a null
  * result.
  *
  * Exists because the declarative spelling —
  * `aggregate(transform(array_sort(collect_list(struct(k, t)))), 0.0,
  * (acc, x) => acc + x)` — evaluates THREE higher-order lambda chains
  * INTERPRETED per element (the q41/q279 lesson, this time in the
  * per-group output projection of every ordered-fold aggregate), and
  * one CodegenFallback expression kicks the whole output stage out of
  * whole-stage codegen. This is one JVM call per GROUP: sort with the
  * same interpreted row ordering `array_sort`'s default comparator
  * resolves to, then a tight primitive accumulation loop.
  *
  * The SORT ORDER (hence the double accumulation order, hence the
  * bits) is identical to the old spelling: ascending natural struct
  * order via [[RowOrdering.createNaturalAscendingOrdering]], which is
  * the same `TypeUtils.getInterpretedOrdering` that `array_sort`'s
  * default `<`-comparator lambda resolves struct comparison to.
  * OrderedFoldSpec pins equality against the declarative reference on
  * random data including tied keys.
  */
case class OrderedFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ordered_fold"

  // the fold is null-PRODUCING even over a non-null array (a null
  // element/value nulls the running sum — the declarative fold's
  // semantics); without this override a non-nullable child (e.g.
  // collect_list) would make projections skip the null check and write
  // the unboxed null as 0.0
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length == 2 && st.fields(1).dataType == DoubleType &&
          RowOrdering.isOrderable(st) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<orderable k, t double>>, got ${t.catalogString}")
  }

  @transient private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(elemType.fields.map(_.dataType).toIndexedSeq)

  override def nullSafeEval(input: Any): Any =
    OrderedFold.fold(input.asInstanceOf[ArrayData], elemType.length, ordering)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ordRef = ctx.addReferenceObj("ordering", ordering,
      classOf[Ordering[InternalRow]].getName)
    val nFields = elemType.length
    nullSafeCodeGen(ctx, ev, arr => {
      val boxed = ctx.freshName("folded")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.OrderedFold.fold($arr, $nFields, $ordRef);
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrderedFold {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[OrderedFold].getName, "ordered_fold")

  /** Sort by the natural struct ordering, then accumulate field 1 in
    * that order. Returns a boxed Double (null when the fold hits a
    * null element/value — the declarative fold's null propagation).
    */
  def fold(arr: ArrayData, nFields: Int,
      ordering: Ordering[InternalRow]): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return java.lang.Double.valueOf(0.0)
    val rows = new Array[InternalRow](n)
    var i = 0
    var anyNull = false
    while (i < n) {
      if (arr.isNullAt(i)) anyNull = true
      else rows(i) = arr.getStruct(i, nFields)
      i += 1
    }
    // a null ELEMENT sorts last under array_sort and its field read is
    // null, so the fold goes (and stays) null — short-circuit equal
    if (anyNull) return null
    java.util.Arrays.sort(rows, ordering)
    var acc = 0.0
    i = 0
    while (i < n) {
      if (rows(i).isNullAt(1)) return null // null t: acc + null = null, forever
      acc += rows(i).getDouble(1)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** map_drop_key(map, key): the input map without the entry whose key
  * equals `key` — the codegen-friendly spelling of
  * `map_filter(m, (k, _) -> k != key)`.
  *
  * Why it exists: the CDC default handler must drop a source column
  * literally named "operation" before injecting its own (the reference's
  * map-insert overwrites, `example/simple/main.go:113-114`, while Spark's
  * `map_concat` under mapKeyDedupPolicy=EXCEPTION throws on the
  * duplicate). `map_filter`'s lambda is a CodegenFallback, and ONE
  * fallback expression anywhere in a projection kicks the whole stage
  * out of whole-stage codegen — even behind an untaken `when` branch —
  * which measured ~2x on the flat serializer lane. This expression keeps
  * the stage fused: the common path (key absent) is a key-array scan
  * that returns the input map with zero allocation.
  */
case class MapDropKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = left.dataType
  override def prettyName: String = "map_drop_key"

  private lazy val valueType: DataType =
    left.dataType.asInstanceOf[MapType].valueType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (MapType(StringType, _, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (map<string,V>, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(m: Any, k: Any): Any =
    MapDropKey.drop(m.asInstanceOf[MapData], k.asInstanceOf[UTF8String], valueType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vt = ctx.addReferenceObj("valueType", valueType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, (m, k) =>
      s"${ev.value} = graft.functions.MapDropKey.drop($m, $k, $vt);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MapDropKey {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MapDropKey].getName, "map_drop_key")

  /** Key-absent fast path returns the input MapData untouched. */
  def drop(m: MapData, key: UTF8String, valueType: DataType): MapData = {
    val keys = m.keyArray()
    val n = m.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (key.equals(keys.getUTF8String(i))) hits += 1
      i += 1
    }
    if (hits == 0) return m
    val values = m.valueArray()
    val outK = new Array[Any](n - hits)
    val outV = new Array[Any](n - hits)
    var o = 0
    i = 0
    while (i < n) {
      if (!key.equals(keys.getUTF8String(i))) {
        outK(o) = keys.getUTF8String(i)
        outV(o) = if (values.isNullAt(i)) null else values.get(i, valueType)
        o += 1
      }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

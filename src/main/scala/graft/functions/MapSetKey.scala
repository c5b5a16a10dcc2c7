package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** map_set_key(map, key, value): the input map with any entry for `key`
  * removed and (`key`, `value`) appended — reference map-insert
  * overwrite semantics (`example/simple/main.go:113-114`) in ONE pass
  * and one allocation.
  *
  * Why it exists: the CDC flat serializer previously spelled this as
  * `map_concat(map_drop_key(img, k), map(k, v))` — correct and fully
  * codegen'd, but the concat re-copies the whole row image into a
  * builder after the drop already scanned it (ablation: the two map ops
  * cost ~25% of the lane at sf0.1). Fusing drop+append halves the map
  * traffic: one scan for the key, one copy sized exactly n(-1)+1.
  */
case class MapSetKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = first.dataType
  override def prettyName: String = "map_set_key"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (MapType(StringType, StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (m, k, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (map<string,string>, string, string), " +
          s"got (${m.catalogString}, ${k.catalogString}, ${v.catalogString})")
    }

  override def nullSafeEval(m: Any, k: Any, v: Any): Any =
    MapSetKey.set(m.asInstanceOf[MapData], k.asInstanceOf[UTF8String],
      v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, k, v) =>
      s"${ev.value} = graft.functions.MapSetKey.set($m, $k, $v);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MapSetKey {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MapSetKey].getName, "map_set_key")

  def set(m: MapData, key: UTF8String, value: UTF8String): MapData = {
    val keys = m.keyArray()
    val values = m.valueArray()
    val n = m.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (key.equals(keys.getUTF8String(i))) hits += 1
      i += 1
    }
    val outN = n - hits + 1
    val outK = new Array[Any](outN)
    val outV = new Array[Any](outN)
    var o = 0
    i = 0
    while (i < n) {
      if (!key.equals(keys.getUTF8String(i))) {
        outK(o) = keys.getUTF8String(i)
        outV(o) = if (values.isNullAt(i)) null else values.getUTF8String(i)
        o += 1
      }
      i += 1
    }
    outK(o) = key
    outV(o) = value
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

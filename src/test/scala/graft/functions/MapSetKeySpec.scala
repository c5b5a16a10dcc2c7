package graft.functions

import org.apache.spark.sql.functions.{call_function, col, lit, map_concat, map, to_json}

import graft.SparkSpec

/** map_set_key semantics: reference map-insert overwrite
  * (drop-any-existing, append-last) fused into one expression — must
  * be extensionally equal to the `map_concat(map_drop_key(m, k),
  * map(k, v))` spelling it replaced in the CDC flat serializer.
  */
class MapSetKeySpec extends SparkSpec {

  private def eval(m: Map[String, String], key: String, v: String): Map[String, String] = {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq(Tuple1(m)).toDF("m")
      .select(call_function("map_set_key", col("m"), lit(key), lit(v)).as("out"))
      .collect()(0).getAs[Map[String, String]]("out")
  }

  test("absent key appends the entry") {
    assert(eval(Map("a" -> "1", "b" -> "2"), "operation", "c")
      == Map("a" -> "1", "b" -> "2", "operation" -> "c"))
  }

  test("present key is overwritten (reference map-insert semantics)") {
    assert(eval(Map("a" -> "1", "operation" -> "stale", "b" -> "2"), "operation", "u")
      == Map("a" -> "1", "b" -> "2", "operation" -> "u"))
  }

  test("null values survive the rebuild") {
    val out = eval(Map("a" -> null), "operation", "c")
    assert(out.contains("a") && out("a") == null && out("operation") == "c")
  }

  test("empty map yields the single entry") {
    assert(eval(Map.empty, "operation", "c") == Map("operation" -> "c"))
  }

  test("null map propagates null") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val out = Seq(Tuple1(null: Map[String, String])).toDF("m")
      .select(call_function("map_set_key", col("m"), lit("k"), lit("v")).as("out"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("json output is byte-identical to the map_concat∘map_drop_key spelling") {
    // the wire contract: the fused expression must not change entry
    // ORDER either — to_json output is the observable
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val rows = Seq(
      Map("a" -> "1", "operation" -> "old", "b" -> "2"),
      Map("x" -> "9"),
      Map[String, String]()).map(Tuple1(_)).toDF("m")
    val got = rows.select(
      to_json(call_function("map_set_key", col("m"), lit("operation"), lit("i"))).as("j"))
      .collect().map(_.getString(0)).toSeq
    val want = rows.select(
      to_json(map_concat(
        call_function("map_drop_key", col("m"), lit("operation")),
        map(lit("operation"), lit("i")))).as("j"))
      .collect().map(_.getString(0)).toSeq
    assert(got == want)
  }

  test("interpreted eval matches codegen eval") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
    import org.apache.spark.sql.types.{MapType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val mt = MapType(StringType, StringType, valueContainsNull = true)
    val m = ArrayBasedMapData(
      Array[Any](UTF8String.fromString("operation"), UTF8String.fromString("z")),
      Array[Any](UTF8String.fromString("v1"), null))
    val expr = MapSetKey(BoundReference(0, mt, nullable = true),
      Literal(UTF8String.fromString("operation"), StringType),
      Literal(UTF8String.fromString("u"), StringType))
    val row = org.apache.spark.sql.catalyst.InternalRow(m)
    val interp = expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    assert(interp.numElements() == 2)
    assert(interp.keyArray().getUTF8String(0).toString == "z")
    assert(interp.valueArray().isNullAt(0))
    assert(interp.keyArray().getUTF8String(1).toString == "operation")
    assert(interp.valueArray().getUTF8String(1).toString == "u")
  }
}

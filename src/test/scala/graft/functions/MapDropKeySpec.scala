package graft.functions

import org.apache.spark.sql.functions.{call_function, col}

import graft.SparkSpec

/** map_drop_key semantics: the codegen-friendly `map_filter(m, (k,_) ->
  * k != key)` used by the CDC default handler's duplicate-"operation"
  * guard.
  */
class MapDropKeySpec extends SparkSpec {

  private def eval(m: Map[String, String], key: String): Map[String, String] = {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq(Tuple1(m)).toDF("m")
      .select(call_function("map_drop_key", col("m"), org.apache.spark.sql.functions.lit(key)).as("out"))
      .collect()(0).getAs[Map[String, String]]("out")
  }

  test("absent key returns the map unchanged") {
    assert(eval(Map("a" -> "1", "b" -> "2"), "operation") == Map("a" -> "1", "b" -> "2"))
  }

  test("present key is dropped, other entries survive in order") {
    assert(eval(Map("a" -> "1", "operation" -> "stale", "b" -> "2"), "operation")
      == Map("a" -> "1", "b" -> "2"))
  }

  test("null values survive the rebuild") {
    val out = eval(Map("a" -> null, "operation" -> "x"), "operation")
    assert(out.contains("a") && out("a") == null)
  }

  test("dropping the only entry yields an empty map") {
    assert(eval(Map("operation" -> "x"), "operation").isEmpty)
  }

  test("null map propagates null") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val out = Seq(Tuple1(null: Map[String, String])).toDF("m")
      .select(call_function("map_drop_key", col("m"),
        org.apache.spark.sql.functions.lit("k")).as("out"))
      .collect()(0)
    assert(out.isNullAt(0))
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
    val expr = MapDropKey(BoundReference(0, mt, nullable = true),
      Literal(UTF8String.fromString("operation"), StringType))
    val row = org.apache.spark.sql.catalyst.InternalRow(m)
    val interp = expr.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    assert(interp.numElements() == 1)
    assert(interp.keyArray().getUTF8String(0).toString == "z")
    assert(interp.valueArray().isNullAt(0))
  }
}

package graft.transform

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.{ChangeEvent, Op}
import graft.route.TopicRouter

/** Schema drift (SURVEY §7 hard parts): the dynamic string-map lane must
  * tolerate mid-stream ALTER TABLE — events for the same table carrying
  * different column sets flow through routing/serialization unchanged,
  * and the bound-schema lane surfaces new columns as nulls until the
  * schema is updated.
  */
class SchemaDriftSpec extends SparkSpec {

  private val router = TopicRouter(Map("public.users" -> "t"))

  private def ev(data: Map[String, String]): ChangeEvent =
    ChangeEvent(new Timestamp(0), "public", "users", null, data, Op.Insert)

  test("map lane carries pre- and post-ALTER events in one stream") {
    import spark.implicits._
    val events = Seq(
      ev(Map("id" -> "1", "name" -> "a")),                      // original shape
      ev(Map("id" -> "2", "name" -> "b", "email" -> "x@y.z")),  // post-ALTER
      ev(Map("id" -> "3"))                                      // column dropped
    ).toDF()
    val values = Handlers.declarative(events, router, "id")
      .selectExpr("cast(value AS string) AS v").collect().map(_.getString(0))
    assert(values.length == 3)
    assert(values.exists(_.contains(""""email":"x@y.z"""")))
    assert(values.forall(_.contains(""""operation":"INSERT"""")))
  }

  test("bound-schema lane nulls missing columns and ignores unknown ones") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val events = Seq(
      ev(Map("id" -> "1", "name" -> "a")),
      ev(Map("id" -> "2", "email" -> "x@y.z"))).toDF()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val rows = Handlers.bindSchema(events, schema)
      .selectExpr("row.id", "row.name").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.getString(1)))).toSet ==
      Set((1L, Some("a")), (2L, None)))
  }
}

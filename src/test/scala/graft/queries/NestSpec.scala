package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q155 NEST / document assembly: conservation (every line item lands in
  * exactly one document) and canonical in-document ordering.
  */
class NestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q155: item conservation — nested counts sum to the lineitem rows") {
    import spark.implicits._
    val docs = Relational.q155Nest(spark, dir)
    val total = graft.sources.Tables.load(spark, dir, "lineitem").count()
    assert(docs.agg(sum($"n_items")).as[Long].head() == total)
    // every document carries at least one item (inner join semantics)
    assert(docs.filter($"n_items" < 1).isEmpty)
  }

  test("q155: items serialize in canonical sorted order") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-nest").toString
    Seq((7L, 3, 500L, 2.0), (7L, 1, 900L, 1.0), (7L, 2, 100L, 4.0))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((7L, 42L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Relational.q155Nest(spark, tmp).collect().head
    assert(r.getAs[String]("items") == "1:900:1|2:100:4|3:500:2")
    assert(r.getAs[Long]("n_items") == 3L && r.getAs[Long]("total_qty") == 7L)
  }
}

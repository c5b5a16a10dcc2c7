package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q81 span-level exact dedup: conservation laws on the real corpus plus a
  * hand-built corpus where the duplicated span and the expected survivor
  * are known exactly.
  */
class SpanDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Span = 16

  test("span conservation: sum(n_spans) = total occurrences, sum(n_dropped) = occurrences - distinct spans") {
    import spark.implicits._
    val spans = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", split($"text", " ").as("ws"))
      .select(explode(transform(
        sequence(lit(0L), ceil(size($"ws").cast("double") / Span).cast("long") - 1),
        i => concat_ws(" ", slice($"ws", (i * Span + 1).cast("int"), lit(Span))))).as("span"))
    val total    = spans.count()
    val distinct = spans.distinct().count()
    val out = Dedup.q81SpanDedup(spark, dir)
      .agg(sum($"n_spans"), sum($"n_dropped")).collect()(0)
    assert(out.getLong(0) == total)
    assert(out.getLong(1) == total - distinct)
  }

  test("a document with no repeated spans round-trips unchanged") {
    import spark.implicits._
    val out = Dedup.q81SpanDedup(spark, dir)
    val orig = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val joined = out.filter($"n_dropped" === 0).join(orig, "doc_id")
    assert(joined.count() > 0) // the law below must not hold vacuously
    assert(joined.filter($"text_clean" =!= $"text").count() == 0)
  }

  test("hand-built corpus: the corpus-wide first occurrence survives, later ones are cut") {
    import spark.implicits._
    val boiler = (1 to Span).map(i => s"b$i").mkString(" ") // one exact span
    val tail0  = (1 to Span).map(i => s"x$i").mkString(" ")
    val tail2  = (1 to 5).map(i => s"y$i").mkString(" ")
    val tmp = Files.createTempDirectory("graft-span").toString
    Seq(
      (0L, s"$boiler $tail0"), // first occurrence: keeps both spans
      (1L, boiler),            // exact boilerplate only: emptied
      (2L, s"$boiler $tail2")  // keeps only its short tail span
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q81SpanDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (0L, 0L, s"$boiler $tail0"),
      (1L, 1L, ""),
      (2L, 1L, tail2)))
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** A/B adjudication probe for the verdict-r15 q230 question: did the
  * r15 switch of the L-gram lane from the interpreted
  * transform/slice/md5 builder to the native `word_ngrams` scan
  * (commit 9e06cdf) cost the lane its ×1.87 committed-pair move, or
  * was that machine contention? Runs BOTH spellings of the gram→seed
  * pipeline interleaved (A B A B) on one clean session so machine
  * drift cancels; everything downstream of `seeds` is identical in
  * the real query, so the probe times the part that changed plus its
  * first consumer (the duplicate-window + count), not the reassembly.
  * Usage: runMain graft.tools.Q230Probe <sfDir> [L]
  */
object Q230Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val L = args.lift(1).map(_.toInt).getOrElse(graft.queries.Dedup.SubstrL)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    def seedsOld(): DataFrame = {
      val ws = Tables.load(spark, dir, "documents")
        .select($"doc_id", split($"text", " ").as("ws"))
      val grams = ws.filter(size($"ws") >= L)
        .select($"doc_id", explode(transform(
          sequence(lit(0L), (size($"ws") - L).cast("long")),
          i => struct(i.as("pos"),
            md5(concat_ws(" ", slice($"ws", (i + 1).cast("int"), lit(L)))).as("h"))))
          .as("g"))
        .select($"doc_id", $"g.pos", $"g.h")
      val cw = Window.partitionBy($"h")
      grams.withColumn("cnt", count(lit(1)).over(cw))
        .filter($"cnt" >= 2).groupBy($"doc_id")
        .agg(count(lit(1)).as("n"), min($"pos").as("p0"))
    }
    def seedsNew(): DataFrame = {
      val grams = Tables.load(spark, dir, "documents")
        .select($"doc_id",
          posexplode(call_function("word_ngrams", $"text", lit(L))).as(Seq("p", "g")))
        .select($"doc_id", $"p".cast("long").as("pos"), md5($"g").as("h"))
      val cw = Window.partitionBy($"h")
      grams.withColumn("cnt", count(lit(1)).over(cw))
        .filter($"cnt" >= 2).groupBy($"doc_id")
        .agg(count(lit(1)).as("n"), min($"pos").as("p0"))
    }
    def time(tag: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JIT/scan warmup both lanes once, then interleave timed attempts
    time("warm_old")(seedsOld()); time("warm_new")(seedsNew())
    for (i <- 1 to 3) { time(s"old_$i")(seedsOld()); time(s"new_$i")(seedsNew()) }
    spark.stop()
  }
}

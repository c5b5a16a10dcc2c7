package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.app.{Connector, ConnectorConfig, KafkaSinkConfig}

import scala.concurrent.duration._

/** Pipeline metrics (O17) through the fused accumulator probe — the
  * production path since the CollectMetrics observe node was measured
  * at ~50% of serializer-lane throughput: per-batch event counts,
  * process latency, per-topic successes and quality violations all
  * surface through the connector's collector while the pipeline runs.
  */
class MetricsSpec extends SparkSpec {

  test("collector reports events and process latency per micro-batch") {
    val src = Files.createTempDirectory("graft-msrc")
    val chk = Files.createTempDirectory("graft-mchk")
    val out = Files.createTempDirectory("graft-mout")
    val lines = (0 until 7).map { i =>
      s"""{"eventTime":"2024-01-01T00:00:00.000Z","tableNamespace":"public","tableName":"users","oldData":null,"newData":{"id":"$i"},"op":"INSERT"}"""
    }
    Files.write(src.resolve("b.json"), String.join("\n", lines: _*).getBytes)

    val conn = new Connector(spark,
      ConnectorConfig(
        sourceDir = src.toString, checkpointDir = chk.toString,
        kafka = KafkaSinkConfig(Seq("unused:9092"),
          tableTopicMapping = Map("public.users" -> "t"),
          producerBatchTickerDuration = 250.millis)),
      sink = "parquet", parquetOutDir = out.toString)
    conn.start()
    val deadline = System.currentTimeMillis() + 60000
    while (conn.totalProcessedEvents < 7 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    conn.close()

    assert(conn.totalProcessedEvents == 7)
    val withData = conn.batchMetrics.filter(_.events > 0)
    // event-time is 2024 → latency is large and positive; duration sane
    assert(withData.forall(_.maxProcessLatencyMs > 0))
    assert(withData.forall(_.batchDurationMs >= 0))
    // per-topic success counters flow from the sink-side probe: the 7
    // clean inserts all route to topic "t"
    assert(conn.metrics.successCount("t") == 7)
  }

  test("inline quality counters: dropped and null-key records surface, good ones don't") {
    val src = Files.createTempDirectory("graft-qsrc")
    val chk = Files.createTempDirectory("graft-qchk")
    val out = Files.createTempDirectory("graft-qout")
    def line(op: String, table: String, data: String) =
      s"""{"eventTime":"2024-01-01T00:00:00.000Z","tableNamespace":"public","tableName":"$table","oldData":null,"newData":$data,"op":"$op"}"""
    val lines = Seq(
      line("INSERT", "users", """{"id":"1"}"""),      // clean
      line("INSERT", "users", """{"id":"2"}"""),      // clean
      line("UPSERT", "users", """{"id":"3"}"""),      // unknown op → dropped
      line("TRUNCATE", "users", """{}"""),             // KNOWN op, keyless by contract — no violation
      line("INSERT", "ghosts", """{"id":"4"}"""),     // unroutable table → dropped
      line("INSERT", "users", """{"name":"x"}"""))    // key field absent → null key
    Files.write(src.resolve("b.json"), String.join("\n", lines: _*).getBytes)

    val conn = new Connector(spark,
      ConnectorConfig(
        sourceDir = src.toString, checkpointDir = chk.toString,
        kafka = KafkaSinkConfig(Seq("unused:9092"),
          tableTopicMapping = Map("public.users" -> "t"),
          producerBatchTickerDuration = 250.millis)),
      sink = "parquet", parquetOutDir = out.toString)
    conn.start()
    val deadline = System.currentTimeMillis() + 60000
    while (conn.totalProcessedEvents < 6 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    conn.close()

    val text = conn.metrics.render
    def metric(c: String): Double =
      text.linesIterator
        .find(l => l.startsWith("graft_cdc_quality_violations_total") &&
          l.contains(s"""constraint="$c""""))
        .map(_.split(' ').last.toDouble).getOrElse(0.0)
    assert(metric("unknown_op") == 1.0, s"unknown_op missing:\n$text")
    assert(metric("unroutable_table") == 1.0, s"unroutable_table missing:\n$text")
    assert(metric("null_key") == 1.0, s"null_key missing:\n$text")
    // every record carries a KNOWN op except the UPSERT, and TRUNCATE
    // is dropped by default (emitTruncates off) — so exactly 3 reach
    // the sink-side topic counter (2 clean + the null-key one)
    assert(conn.metrics.successCount("t") == 3)
  }
}

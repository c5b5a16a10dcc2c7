package graft.streaming

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.concurrent.duration._

import graft.SparkSpec
import graft.app.{Connector, ConnectorConfig, KafkaSinkConfig}

/** The Prometheus exposition endpoint: metric names match the reference's
  * families, counters are monotonic across scrapes during a live
  * streaming run, and /status tracks query liveness.
  */
class MetricsServerSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(5000); c.setReadTimeout(5000)
    val code = c.getResponseCode
    val stream = if (code >= 400) c.getErrorStream else c.getInputStream
    val body = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
    c.disconnect()
    (code, body)
  }

  private def metricValue(body: String, prefix: String): Double =
    body.linesIterator
      .filter(l => l.startsWith(prefix) && !l.startsWith("#"))
      .map(_.split(' ').last.toDouble).sum

  test("registry renders the reference metric families with labels") {
    val r = new MetricsRegistry("slot1")
    r.setProcessLatency(42L)
    r.setBulkRequestLatency(7L)
    r.incrementSuccess("cdc.users", 3L)
    r.incrementErr("cdc.users")
    val text = r.render
    assert(text.contains("# TYPE graft_cdc_process_latency_current gauge"))
    assert(text.contains("# TYPE graft_cdc_bulk_request_process_latency_current gauge"))
    assert(text.contains("# TYPE graft_cdc_write_total counter"))
    assert(text.contains("# TYPE graft_cdc_err_total counter"))
    assert(text.contains("""slot_name="slot1""""))
    assert(text.contains("""topic_name="cdc.users"} 3.0"""))
    assert(metricValue(text, "graft_cdc_process_latency_current") == 42.0)
    assert(metricValue(text, "graft_cdc_err_total") == 1.0)
  }

  test("endpoint scrapes during a streaming run: names present, counters monotonic") {
    val src = Files.createTempDirectory("graft-promsrc")
    val chk = Files.createTempDirectory("graft-promchk")
    val out = Files.createTempDirectory("graft-promout")
    def write(name: String, n: Int, from: Int): Unit = {
      val lines = (from until from + n).map { i =>
        s"""{"eventTime":"2024-01-01T00:00:00.000Z","tableNamespace":"public","tableName":"users","oldData":null,"newData":{"id":"$i"},"op":"INSERT"}"""
      }
      Files.write(src.resolve(name), String.join("\n", lines: _*).getBytes)
    }
    write("b1.json", 5, 0)

    val conn = new Connector(spark,
      ConnectorConfig(
        sourceDir = src.toString, checkpointDir = chk.toString,
        kafka = KafkaSinkConfig(Seq("unused:9092"),
          tableTopicMapping = Map("public.users" -> "cdc.users"),
          producerBatchTickerDuration = 200.millis),
        metricsPort = Some(0)), // ephemeral
      sink = "parquet", parquetOutDir = out.toString)
    try {
      conn.start()
      conn.waitUntilReady()
      val port = conn.metricsPort.get
      val base = s"http://127.0.0.1:$port"

      val deadline = System.currentTimeMillis() + 60000
      def writes(): Double = metricValue(get(s"$base/metrics")._2, "graft_cdc_write_total")
      while (writes() < 5.0 && System.currentTimeMillis() < deadline) Thread.sleep(200)

      val (code1, body1) = get(s"$base/metrics")
      assert(code1 == 200)
      assert(body1.contains("graft_cdc_process_latency_current"))
      assert(body1.contains("graft_cdc_bulk_request_process_latency_current"))
      assert(body1.contains("""graft_cdc_write_total{"""))
      assert(body1.contains("""topic_name="cdc.users""""))
      val w1 = metricValue(body1, "graft_cdc_write_total")
      assert(w1 == 5.0, s"expected 5 successful writes, got $w1\n$body1")

      assert(get(s"$base/status")._1 == 200)

      // more input arrives → the counter only moves up
      write("b2.json", 3, 5)
      while (writes() < 8.0 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      val w2 = metricValue(get(s"$base/metrics")._2, "graft_cdc_write_total")
      assert(w2 == 8.0, s"counter must be monotonic: $w1 -> $w2")

      conn.close()
      // server stops with the connector
      intercept[Exception](get(s"$base/status"))
    } finally conn.close()
  }

  test("/status reports 503 when the probe fails") {
    val r = new MetricsRegistry("s")
    val srv = new MetricsServer(r, () => false, 0)
    try {
      val (code, body) = get(s"http://127.0.0.1:${srv.boundPort}/status")
      assert(code == 503 && body == "UNAVAILABLE")
    } finally srv.close()
  }

  test("snapshot metric family populates during a snapshot_only run (reference README.md:292-301)") {
    val r = new MetricsRegistry("snap-slot")
    val chk = Files.createTempDirectory("graft-snap-metrics-chk")
    val out = Files.createTempDirectory("graft-snap-metrics-out")
    val cfg = ConnectorConfig(
      sourceDir = "",
      checkpointDir = chk.toString,
      kafka = KafkaSinkConfig(
        brokers = Seq("unused:9092"),
        tableTopicMapping = Map("public.nation" -> "nation-topic")),
      keyField = "n_nationkey",
      snapshot = graft.app.SnapshotConfig(enabled = true,
        mode = graft.app.SnapshotConfig.ModeSnapshotOnly,
        tables = Seq("nation"), dataDir = "/root/testdata/sf0.001"))
    CdcPipeline.runSnapshotPhase(spark, cfg, "parquet", out.toString, Some(r))
    assert(r.snapshotRows == 25, s"nation has 25 rows, saw ${r.snapshotRows}")
    assert(r.snapshotCompletedChunks >= 1)
    val body = r.render
    assert(metricValue(body, "graft_cdc_snapshot_total_rows") == 25.0)
    assert(metricValue(body, "graft_cdc_snapshot_total_tables") == 1.0)
    assert(metricValue(body, "graft_cdc_snapshot_in_progress") == 0.0) // finished
    assert(metricValue(body, "graft_cdc_snapshot_duration_seconds") >= 0.0)
    assert(body.contains("graft_cdc_replication_lag_current"))
    assert(body.contains("graft_cdc_replication_commits_total"))
  }

  test("/debug/threads: 404 without debugMode, thread dump with it (cdc.debugMode)") {
    val r = new MetricsRegistry("s")
    val off = new MetricsServer(r, () => true, 0)
    try {
      val (code, _) = get(s"http://127.0.0.1:${off.boundPort}/debug/threads")
      assert(code == 404) // like the reference's unmounted pprof
    } finally off.close()
    val on = new MetricsServer(r, () => true, 0, debugMode = true)
    try {
      val (code, body) = get(s"http://127.0.0.1:${on.boundPort}/debug/threads")
      assert(code == 200)
      assert(body.contains("\"main\"") || body.contains("RUNNABLE"))
      assert(body.contains("\tat ")) // stack frames present
    } finally on.close()
  }
}

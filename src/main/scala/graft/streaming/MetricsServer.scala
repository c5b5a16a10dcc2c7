package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.atomic.LongAdder

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Prometheus-style metric registry for the connector — the same metric
  * families the reference registers (`kafka/producer/metric.go:12-111`):
  * two latency gauges (process / bulk-request) and two per-topic counters
  * (successful / failed writes), all labeled with host and slot name.
  * Names use this engine's `graft_cdc` namespace with the reference's
  * subsystem/name structure (`<ns>_process_latency_current`,
  * `<ns>_write_total`, ...).
  *
  * Thread-safe: gauges are atomics, counters are LongAdders in a TrieMap
  * (listener thread writes, HTTP server thread renders).
  */
final class MetricsRegistry(val slotName: String) {
  private val host =
    try java.net.InetAddress.getLocalHost.getHostName catch { case _: Exception => "unknown" }

  private val processLatencyMs = new AtomicLong(0L)
  private val bulkLatencyMs = new AtomicLong(0L)
  private val writeTotal = TrieMap.empty[String, LongAdder]
  private val errTotal = TrieMap.empty[String, LongAdder]

  // snapshot family (reference README.md:292-301). Chunk mapping for
  // the bounded AvailableNow snapshot run: one committed micro-batch ≙
  // one claimed chunk (the resume-safe unit of snapshot progress).
  private val snapInProgress = new AtomicLong(0L)
  private val snapTotalTables = new AtomicLong(0L)
  private val snapCompletedChunks = new AtomicLong(0L)
  private val snapRows = new LongAdder
  private val snapDurationMs = new AtomicLong(0L)

  // live replication-lane gauges (upstream go-pq-cdc exposes slot/CDC
  // health the same way; lag = now - last commit's timestamp)
  private val replLagMs = new AtomicLong(0L)
  private val replCommits = new LongAdder

  // slot-health family fed by the SlotActivityChecker each tick
  // (upstream go-pq-cdc's replication_slot metrics: activity,
  // confirmed_flush/current LSN, retained WAL, lag)
  private val slotKnown = new AtomicLong(0L) // 1 once a check has run
  private val slotActive = new AtomicLong(0L)
  private val slotConfirmedFlush = new AtomicLong(0L)
  private val slotCurrentLsn = new AtomicLong(0L)
  private val slotRetainedWal = new AtomicLong(0L)
  private val slotLagBytes = new AtomicLong(0L)
  private val slotDropped = new AtomicLong(0L)

  // inline data-quality counters fed by the graft_quality observation
  // (unknown_op / unroutable_table / null_key per constraint name)
  private val qualityTotal = TrieMap.empty[String, LongAdder]

  def setProcessLatency(ms: Long): Unit = processLatencyMs.set(ms)
  def incrementQualityViolation(constraint: String, n: Long = 1L): Unit =
    qualityTotal.getOrElseUpdate(constraint, new LongAdder).add(n)
  def setBulkRequestLatency(ms: Long): Unit = bulkLatencyMs.set(ms)
  def incrementSuccess(topic: String, n: Long = 1L): Unit =
    writeTotal.getOrElseUpdate(topic, new LongAdder).add(n)
  def incrementErr(topic: String, n: Long = 1L): Unit =
    errTotal.getOrElseUpdate(topic, new LongAdder).add(n)

  def successCount(topic: String): Long = writeTotal.get(topic).fold(0L)(_.sum)
  def errCount(topic: String): Long = errTotal.get(topic).fold(0L)(_.sum)

  def setSnapshotInProgress(active: Boolean): Unit =
    snapInProgress.set(if (active) 1L else 0L)
  def setSnapshotTotalTables(n: Long): Unit = snapTotalTables.set(n)
  def incrementSnapshotChunk(): Unit = snapCompletedChunks.incrementAndGet()
  def addSnapshotRows(n: Long): Unit = snapRows.add(n)
  def setSnapshotDurationMs(ms: Long): Unit = snapDurationMs.set(ms)
  def snapshotRows: Long = snapRows.sum
  def snapshotCompletedChunks: Long = snapCompletedChunks.get

  def setReplicationLag(ms: Long): Unit = replLagMs.set(math.max(ms, 0L))
  def incrementReplicationCommit(): Unit = replCommits.increment()
  def replicationCommits: Long = replCommits.sum

  /** One slot-health observation; None = the slot has been dropped. */
  def setSlotInfo(info: Option[graft.sources.cdc.ReplicationBootstrap.SlotInfo]): Unit = {
    slotKnown.set(1L)
    info match {
      case Some(s) =>
        slotActive.set(if (s.active) 1L else 0L)
        slotConfirmedFlush.set(s.confirmedFlushLsn)
        slotCurrentLsn.set(s.currentWalLsn)
        slotRetainedWal.set(s.retainedWalBytes)
        slotLagBytes.set(s.lagBytes)
        slotDropped.set(0L)
      case None =>
        slotActive.set(0L)
        slotDropped.set(1L)
    }
  }
  def slotObserved: Boolean = slotKnown.get == 1L
  def slotIsDropped: Boolean = slotDropped.get == 1L

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def labels(extra: (String, String)*): String =
    (Seq("host" -> host, "slot_name" -> slotName) ++ extra)
      .map { case (k, v) => s"""$k="${esc(v)}"""" }.mkString("{", ",", "}")

  /** Prometheus text exposition format 0.0.4. */
  def render: String = {
    val sb = new StringBuilder
    def gauge(name: String, help: String, v: Long): Unit = {
      sb ++= s"# HELP $name $help\n# TYPE $name gauge\n"
      sb ++= s"$name${labels()} ${v.toDouble}\n"
    }
    def counter(name: String, help: String, m: TrieMap[String, LongAdder]): Unit = {
      sb ++= s"# HELP $name $help\n# TYPE $name counter\n"
      m.toSeq.sortBy(_._1).foreach { case (topic, n) =>
        sb ++= s"$name${labels("topic_name" -> topic)} ${n.sum.toDouble}\n"
      }
    }
    gauge("graft_cdc_process_latency_current",
      "latest connector process latency in milliseconds", processLatencyMs.get)
    gauge("graft_cdc_bulk_request_process_latency_current",
      "latest connector micro-batch (bulk request) duration in milliseconds",
      bulkLatencyMs.get)
    counter("graft_cdc_write_total",
      "total number of successful write operations to the sink", writeTotal)
    counter("graft_cdc_err_total",
      "total number of failed write operations to the sink", errTotal)
    sb ++= "# HELP graft_cdc_quality_violations_total records failing an inline data-quality constraint\n"
    sb ++= "# TYPE graft_cdc_quality_violations_total counter\n"
    qualityTotal.toSeq.sortBy(_._1).foreach { case (c, n) =>
      sb ++= s"graft_cdc_quality_violations_total${labels("constraint" -> c)} ${n.sum.toDouble}\n"
    }
    gauge("graft_cdc_snapshot_in_progress",
      "whether a snapshot is currently in progress (1 active, 0 inactive)",
      snapInProgress.get)
    gauge("graft_cdc_snapshot_total_tables",
      "total number of tables to snapshot", snapTotalTables.get)
    gauge("graft_cdc_snapshot_completed_chunks",
      "number of snapshot chunks (committed micro-batches) completed",
      snapCompletedChunks.get)
    sb ++= "# HELP graft_cdc_snapshot_total_rows total rows read during snapshot\n"
    sb ++= "# TYPE graft_cdc_snapshot_total_rows counter\n"
    sb ++= s"graft_cdc_snapshot_total_rows${labels()} ${snapRows.sum.toDouble}\n"
    sb ++= "# HELP graft_cdc_snapshot_duration_seconds duration of the last snapshot\n"
    sb ++= "# TYPE graft_cdc_snapshot_duration_seconds gauge\n"
    sb ++= s"graft_cdc_snapshot_duration_seconds${labels()} ${snapDurationMs.get / 1000.0}\n"
    gauge("graft_cdc_replication_lag_current",
      "milliseconds between now and the last replicated commit",
      replLagMs.get)
    sb ++= "# HELP graft_cdc_replication_commits_total transactions replicated and acked\n"
    sb ++= "# TYPE graft_cdc_replication_commits_total counter\n"
    sb ++= s"graft_cdc_replication_commits_total${labels()} ${replCommits.sum.toDouble}\n"
    if (slotKnown.get == 1L) {
      gauge("graft_cdc_slot_activity",
        "whether the replication slot has an active consumer (1 active)",
        slotActive.get)
      gauge("graft_cdc_slot_confirmed_flush_lsn",
        "the slot's confirmed_flush_lsn", slotConfirmedFlush.get)
      gauge("graft_cdc_slot_current_lsn",
        "the server's current WAL write position", slotCurrentLsn.get)
      gauge("graft_cdc_slot_retained_walsize",
        "WAL bytes retained for the slot (current - restart_lsn)",
        slotRetainedWal.get)
      gauge("graft_cdc_slot_lag",
        "WAL bytes not yet confirmed by the consumer (current - confirmed_flush)",
        slotLagBytes.get)
      gauge("graft_cdc_slot_dropped",
        "1 when the replication slot no longer exists on the server",
        slotDropped.get)
    }
    sb.result()
  }
}

/** HTTP exposition endpoint (reference `README.md:270-299`): `/metrics`
  * serves the registry in Prometheus text format, `/status` returns
  * 200 OK while the supplied probe holds (the reference pings PostgreSQL;
  * here the probe is typically "the streaming query is active"), 503
  * otherwise. With `debugMode` (≙ `cdc.debugMode` serving pprof,
  * `README.md:227,276`) `/debug/threads` dumps every JVM thread with its
  * stack — the goroutine-dump analogue; off by default and 404 when
  * disabled, like the reference's pprof mount. Built on the JDK's own
  * HttpServer — no dependencies. Port 0 binds an ephemeral port (tests);
  * the reference default is 8080 (`cdc.metric.port`, `README.md:229`).
  */
final class MetricsServer(
    registry: MetricsRegistry,
    statusProbe: () => Boolean = () => true,
    port: Int = 0,
    debugMode: Boolean = false) extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(x: HttpExchange, code: Int, body: String, ctype: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", ctype)
    x.sendResponseHeaders(code, bytes.length.toLong)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/metrics", (x: HttpExchange) =>
    respond(x, 200, registry.render, "text/plain; version=0.0.4; charset=utf-8"))
  server.createContext("/status", { (x: HttpExchange) =>
    val up = try statusProbe() catch { case _: Exception => false }
    respond(x, if (up) 200 else 503, if (up) "OK" else "UNAVAILABLE", "text/plain")
  })
  server.createContext("/debug/threads", { (x: HttpExchange) =>
    if (!debugMode) respond(x, 404, "debugMode disabled", "text/plain")
    else {
      val sb = new StringBuilder
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.asScala.toSeq
        .sortBy(_._1.getName).foreach { case (t, frames) =>
          sb ++= s""""${t.getName}" #${t.getId} ${t.getState}\n"""
          frames.foreach(f => sb ++= s"\tat $f\n")
          sb ++= "\n"
        }
      respond(x, 200, sb.result(), "text/plain")
    }
  })
  server.start()

  /** The bound port (useful with ephemeral port 0). */
  def boundPort: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)
}

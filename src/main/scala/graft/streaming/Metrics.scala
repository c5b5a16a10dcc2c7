package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.jdk.CollectionConverters._

/** Pipeline metrics (reference O17, `kafka/producer/metric.go:12-111`):
  *
  *   - process latency (event-time → produce):
  *     `current_timestamp - eventTime` observed per micro-batch
  *   - success counters per topic
  *   - bulk-flush latency ≙ the micro-batch `batchDuration` Spark already
  *     reports in StreamingQueryProgress
  *
  * Implemented with `Dataset.observe` (metrics ride the existing plan —
  * zero extra passes at any scale) + a StreamingQueryListener that
  * surfaces them, the Spark-native stand-in for the reference's
  * Prometheus registry.
  */
object Metrics {

  val ObservationName = "graft_pipeline"

  /** Attach observed metrics to a ChangeEvent-schema stream (call before
    * the handler so eventTime is still present).
    */
  def observed(events: DataFrame): DataFrame =
    events.observe(
      ObservationName,
      count(lit(1)).as("events"),
      max(unix_millis(current_timestamp()) - unix_millis(col("eventTime")))
        .as("max_process_latency_ms"),
      approx_count_distinct(concat_ws(".", col("tableNamespace"), col("tableName")))
        .as("approx_tables"))

  final case class BatchMetrics(
      batchId: Long,
      events: Long,
      maxProcessLatencyMs: Long,
      batchDurationMs: Long)

  /** Listener collecting per-batch metrics (≙ `ResponseHandler.OnSuccess`
    * accounting + latency gauges). Thread-safe; read via `snapshot`.
    */
  final class Collector extends StreamingQueryListener {
    private val batches = new ConcurrentLinkedQueue[BatchMetrics]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      Option(p.observedMetrics.get(ObservationName)).foreach { m =>
        batches.add(BatchMetrics(
          p.batchId,
          m.getAs[Long]("events"),
          Option(m.getAs[Any]("max_process_latency_ms")).fold(0L)(_.asInstanceOf[Long]),
          p.batchDuration))
      }
    }

    def snapshot: Seq[BatchMetrics] = batches.asScala.toSeq
    def totalEvents: Long = snapshot.map(_.events).sum
  }
}

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
  val SinkObservationName = "graft_sink"
  private val TopicMetricPrefix = "topic:"

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

  /** Attach per-topic record counts to the handled (sink-contract) stream.
    * The topic set is the finite routing codomain from config, so the
    * counts are plain conditional aggregates riding the existing plan —
    * no extra pass, no shuffle — and feed the registry's per-topic
    * success counters (reference `IncrementSuccessOp`).
    */
  def observedSink(records: DataFrame, topics: Seq[String]): DataFrame =
    if (topics.isEmpty) records
    else {
      val aggs = count(lit(1)).as("records") +: topics.distinct.map(t =>
        sum(when(col("topic") === t, 1L).otherwise(0L)).as(s"$TopicMetricPrefix$t"))
      records.observe(SinkObservationName, aggs.head, aggs.tail: _*)
    }

  final case class BatchMetrics(
      batchId: Long,
      events: Long,
      maxProcessLatencyMs: Long,
      batchDurationMs: Long)

  /** Listener collecting per-batch metrics (≙ `ResponseHandler.OnSuccess`
    * accounting + latency gauges). Thread-safe; read via `snapshot`.
    * When a [[MetricsRegistry]] is supplied, each progress event also
    * updates the exposition state: the two latency gauges and — from the
    * sink-side observation — the per-topic success counters.
    */
  final class Collector(registry: Option[MetricsRegistry] = None)
      extends StreamingQueryListener {
    private val batches = new ConcurrentLinkedQueue[BatchMetrics]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      Option(p.observedMetrics.get(ObservationName)).foreach { m =>
        val latency =
          Option(m.getAs[Any]("max_process_latency_ms")).fold(0L)(_.asInstanceOf[Long])
        batches.add(BatchMetrics(p.batchId, m.getAs[Long]("events"), latency, p.batchDuration))
        registry.foreach { r =>
          r.setProcessLatency(latency)
          r.setBulkRequestLatency(p.batchDuration)
        }
      }
      for {
        r <- registry
        m <- Option(p.observedMetrics.get(SinkObservationName))
      } m.schema.fieldNames.filter(_.startsWith(TopicMetricPrefix)).foreach { f =>
        Option(m.getAs[Any](f)).map(_.asInstanceOf[Long]).filter(_ > 0)
          .foreach(n => r.incrementSuccess(f.stripPrefix(TopicMetricPrefix), n))
      }
    }

    def snapshot: Seq[BatchMetrics] = batches.asScala.toSeq
    def totalEvents: Long = snapshot.map(_.events).sum
  }
}

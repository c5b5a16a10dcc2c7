package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.app.ConnectorConfig
import graft.model.ChangeEvent
import graft.route.TopicRouter
import graft.transform.Handlers

/** The CDC pipeline as Structured Streaming (SURVEY §3.1):
  *
  *   readStream (CDC source) → normalize/route/handle (Handlers) →
  *   writeStream.trigger(ProcessingTime(ticker)).option(checkpoint, …)
  *
  * Delivery semantics: the reference ACKs the replication LSN only after a
  * successful Kafka write (`producer_batch.go:141-151`) — at-least-once,
  * order preserved per slot. Here the micro-batch checkpoint commits only
  * after the sink write succeeds, giving the same at-least-once guarantee
  * (exactly-once for replayable sources + idempotent sinks). Ordering is
  * per-partition; route the stream `repartition(col("key"))` upstream when
  * per-key total order is required (SURVEY §7 "Hard parts").
  */
object CdcPipeline {

  /** File-lane CDC source: newline-JSON change events with the ChangeEvent
    * schema. Stands in for the pgoutput replication stream in tests/demos;
    * swapping in a Kafka or custom MicroBatchStream source changes only
    * this method (same schema contract).
    */
  def fromJsonFiles(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", 16) // bounded micro-batches on backfill
      .json(dir)

  /** The custom DataSourceV2 lane (graft.sources.cdc.CdcSource): same
    * schema contract, plus source-side op/table filter pushdown and
    * LSN-positional offsets.
    */
  def fromCdcSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("graft-cdc").option("path", dir).load()

  private def source(spark: SparkSession, cfg: ConnectorConfig): DataFrame =
    if (cfg.sourceFormat == "graft-cdc") fromCdcSource(spark, cfg.sourceDir)
    else fromJsonFiles(spark, cfg.sourceDir)

  /** Normalize + route + default-handle: ChangeEvent stream → Kafka sink
    * contract (topic/key/value/headers), with per-batch observed metrics
    * (O17) riding the plan.
    */
  def defaultTransform(events: DataFrame, cfg: ConnectorConfig): DataFrame =
    Handlers.declarative(Metrics.observed(events),
      TopicRouter(cfg.kafka.tableTopicMapping), cfg.keyField)

  /** Production sink: Spark's Kafka writer with the reference's producer
    * options; trigger interval ≙ batch ticker (O13); checkpoint ≙ LSN ACK
    * (O14).
    */
  def kafkaSink(records: DataFrame, cfg: ConnectorConfig): DataStreamWriter[Row] = {
    val w = records.writeStream
      .format("kafka")
      .trigger(Trigger.ProcessingTime(cfg.kafka.producerBatchTickerDuration.toMillis))
      .option("checkpointLocation", cfg.checkpointDir)
    cfg.kafka.sinkOptions.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Test/file sink with identical commit semantics: parquet append with
    * the same checkpoint-after-write contract as the Kafka sink. Used by
    * the resume tests (mirrors `connector_test.go:416-648`).
    */
  def parquetSink(records: DataFrame, cfg: ConnectorConfig, outDir: String): DataStreamWriter[Row] =
    records.writeStream
      .format("parquet")
      .trigger(Trigger.ProcessingTime(cfg.kafka.producerBatchTickerDuration.toMillis))
      .option("checkpointLocation", cfg.checkpointDir)
      .option("path", outDir)

  /** Wire the full pipeline to a parquet sink and start it. */
  def startToParquet(spark: SparkSession, cfg: ConnectorConfig, outDir: String): StreamingQuery =
    parquetSink(defaultTransform(source(spark, cfg), cfg), cfg, outDir).start()

  /** Wire the full pipeline to the Kafka sink and start it. */
  def startToKafka(spark: SparkSession, cfg: ConnectorConfig): StreamingQuery =
    kafkaSink(defaultTransform(source(spark, cfg), cfg), cfg).start()
}

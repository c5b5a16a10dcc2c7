package graft.app

import scala.concurrent.duration._

/** Connector configuration surface, mirroring the reference's config model
  * and defaults (`/root/reference/config/config.go:12-100`,
  * `README.md:222-268`) re-expressed as Spark/Kafka-sink options.
  *
  * The count/byte/time batch triple maps onto Spark producer configs, not
  * custom accumulator code (SURVEY §2A O13):
  *   - producerBatchTickerDuration → micro-batch `Trigger.ProcessingTime`
  *   - producerBatchSize/Bytes     → `kafka.batch.size` / `kafka.linger.ms`
  *     and `kafka.max.request.size` on the sink
  */
final case class KafkaSinkConfig(
    brokers: Seq[String],
    tableTopicMapping: Map[String, String] = Map.empty,
    producerBatchSize: Int = 2000,                      // config.go:79-81
    producerBatchBytes: Long = 1L << 20,                // "1mb", config.go:83-85
    producerBatchTickerDuration: FiniteDuration = 10.seconds, // config.go:75-77
    requiredAcks: Int = 1,                              // config.go:87-89
    compression: String = "none",                       // config.go:60-65 (0 = none)
    readTimeout: FiniteDuration = 30.seconds,           // config.go:70-72
    writeTimeout: FiniteDuration = 30.seconds,          // config.go:66-68
    producerMaxAttempts: Int = Int.MaxValue,            // config.go:96-98
    clientId: String = "graft",
    allowAutoTopicCreation: Boolean = false) {

  /** Render as `kafka.*` options for Spark's Kafka sink. */
  def sinkOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers"         -> brokers.mkString(","),
    "kafka.acks"                      -> requiredAcks.toString,
    "kafka.compression.type"          -> compression,
    "kafka.batch.size"                -> producerBatchSize.toString,
    "kafka.max.request.size"          -> producerBatchBytes.toString,
    "kafka.request.timeout.ms"        -> writeTimeout.toMillis.toString,
    "kafka.retries"                   -> producerMaxAttempts.toString,
    "kafka.client.id"                 -> clientId,
    "kafka.allow.auto.create.topics"  -> allowAutoTopicCreation.toString)
}

/** Snapshot source config (reference `cdcconfig.SnapshotConfig`,
  * `example/snapshot/main.go:90-98`; modes `README.md:59-63`). A chunk is
  * a JDBC partition / parquet split; claim/heartbeat/resume bookkeeping is
  * subsumed by Spark task scheduling + retries (SURVEY §2A S2).
  */
final case class SnapshotConfig(
    enabled: Boolean = false,
    mode: String = SnapshotConfig.ModeInitial, // initial | always | never
    chunkSize: Int = 10000,
    tables: Seq[String] = Seq.empty)

object KafkaSinkConfig {
  /** Parse human byte sizes ("1mb", "512k") — reference O19
    * (`internal/bytes/bytes.go:57-82`), delegated to Spark's own
    * JavaUtils so config strings behave exactly like Spark's.
    */
  def parseBytes(s: String): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
}

object SnapshotConfig {
  val ModeInitial = "initial"
  val ModeAlways  = "always"
  val ModeNever   = "never"
}

/** Top-level connector config (reference `config.Connector`). */
final case class ConnectorConfig(
    sourceDir: String,                 // CDC event stream directory (file source lane)
    checkpointDir: String,             // ACK ≙ checkpoint commit (SURVEY §2A O14)
    kafka: KafkaSinkConfig,
    snapshot: SnapshotConfig = SnapshotConfig(),
    keyField: String = "id",
    sourceFormat: String = "json")     // "json" | "graft-cdc" (DataSourceV2 lane)

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
    allowAutoTopicCreation: Boolean = false,
    metadataTtl: FiniteDuration = 60.seconds,           // config.go:27 MetadataTTL
    // config.go:22 MetadataTopics — kafka-go eagerly refreshes metadata
    // for ALL cluster topics unless restricted to this list; the Java
    // producer underneath Spark's sink already fetches metadata lazily
    // per produced topic, so the knob is subsumed. Accepted (and kept
    // here so a reference YAML round-trips) but never rendered as a
    // sink option.
    metadataTopics: Seq[String] = Seq.empty,
    // security surface (config.go:32 SecureConnection; kafka/client.go:53-115:
    // SCRAM-SHA-512 over TLS >= 1.2 with a root+intermediate CA pool)
    secureConnection: Boolean = false,
    scramUsername: String = "",
    scramPassword: String = "",
    rootCaPem: String = "",
    interCaPem: String = "",
    // partition balancer (config.go:40-57 GetBalancer)
    balancer: String = KafkaSinkConfig.BalancerHash,
    // partition count of the target topics — required by the client-side
    // balancers (ReferenceHash/CRC32Balancer compute partition = f(key) % n
    // as an explicit output column; a Kafka producer learns n from
    // metadata, a declarative plan must be told)
    topicPartitions: Int = 0) {

  /** Render as `kafka.*` options for Spark's Kafka sink.
    *
    * Security mapping (kafka/client.go:53-75 → Java-producer configs):
    * SecureConnection turns on SASL_SSL with the SCRAM-SHA-512 mechanism
    * (the reference's `scram.Mechanism(scram.SHA512, …)`), the CA pool
    * becomes an inline PEM truststore (root + intermediate concatenated,
    * `AppendCertsFromPEM` twice), and `MinVersion: TLS12` becomes the
    * enabled-protocols list.
    */
  def sinkOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers"         -> brokers.mkString(","),
    "kafka.acks"                      -> requiredAcks.toString,
    "kafka.compression.type"          -> compression,
    "kafka.batch.size"                -> producerBatchSize.toString,
    "kafka.max.request.size"          -> producerBatchBytes.toString,
    "kafka.request.timeout.ms"        -> writeTimeout.toMillis.toString,
    "kafka.retries"                   -> producerMaxAttempts.toString,
    "kafka.client.id"                 -> clientId,
    "kafka.allow.auto.create.topics"  -> allowAutoTopicCreation.toString,
    "kafka.metadata.max.age.ms"       -> metadataTtl.toMillis.toString
  ) ++ securityOptions ++ balancerOptions

  private def jaasEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def securityOptions: Map[String, String] =
    if (!secureConnection) Map.empty
    else Map(
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism"    -> "SCRAM-SHA-512",
      "kafka.sasl.jaas.config"  ->
        ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
          s"""username="${jaasEscape(scramUsername)}" """ +
          s"""password="${jaasEscape(scramPassword)}";"""),
      "kafka.ssl.enabled.protocols" -> "TLSv1.2,TLSv1.3" // MinVersion TLS12
    ) ++ (if (rootCaPem.isEmpty && interCaPem.isEmpty) Map.empty
          else Map(
            "kafka.ssl.truststore.type" -> "PEM",
            "kafka.ssl.truststore.certificates" ->
              Seq(rootCaPem, interCaPem).filter(_.nonEmpty).mkString("\n")))

  /** Balancer → Java-producer partitioner (config.go:40-57). `Hash` and
    * `Murmur2Balancer` are the producer's default hash-the-key
    * partitioner (the Java client hashes with murmur2 where kafka-go's
    * `Hash` uses FNV-1a — same contract: a key sticks to one partition);
    * `RoundRobin` maps to the RoundRobinPartitioner. `ReferenceHash` /
    * `CRC32Balancer` are pure key functions, computed CLIENT-SIDE as an
    * explicit `partition` column ([[explicitPartition]]) — they render no
    * producer option but require `topicPartitions`. `LeastBytes` is
    * producer-state-dependent (least-loaded placement) with no
    * declarative equivalent — rejected loudly (the reference panics on
    * unknown balancers too); its users get custom placement via an
    * explicit `partition` column from the handler.
    */
  private def balancerOptions: Map[String, String] = balancer match {
    case "" | KafkaSinkConfig.BalancerHash | KafkaSinkConfig.BalancerMurmur2 =>
      Map.empty // producer default: hash key → partition
    case KafkaSinkConfig.BalancerRoundRobin =>
      Map("kafka.partitioner.class" ->
        "org.apache.kafka.clients.producer.RoundRobinPartitioner")
    case KafkaSinkConfig.BalancerReferenceHash | KafkaSinkConfig.BalancerCrc32 =>
      require(topicPartitions > 0,
        s"balancer '$balancer' computes partitions client-side and needs " +
        "topicPartitions > 0 (the target topics' partition count)")
      Map.empty // placement happens via the explicit partition column
    case other =>
      throw new IllegalArgumentException(
        s"unsupported kafka balancer '$other': supported are " +
        s"${KafkaSinkConfig.supportedBalancers.mkString(", ")}; for custom " +
        "placement emit an explicit 'partition' column from the handler")
  }
}

/** Snapshot source config (reference `cdcconfig.SnapshotConfig`,
  * `example/snapshot/main.go:90-98`; modes `README.md:59-63`). A chunk is
  * a JDBC partition / parquet split; claim/heartbeat/resume bookkeeping is
  * subsumed by Spark task scheduling + retries (SURVEY §2A S2).
  */
final case class SnapshotConfig(
    enabled: Boolean = false,
    mode: String = SnapshotConfig.ModeInitial, // initial | never | snapshot_only
    chunkSize: Int = 10000,
    tables: Seq[String] = Seq.empty,
    dataDir: String = "") // table store the snapshot scans (parquet lane)

object KafkaSinkConfig {
  /** Parse human byte sizes ("1mb", "512k") — reference O19
    * (`internal/bytes/bytes.go:57-82`), delegated to Spark's own
    * JavaUtils so config strings behave exactly like Spark's.
    */
  def parseBytes(s: String): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)

  val BalancerHash       = "Hash"           // config.go:42-43 (default)
  val BalancerRoundRobin = "RoundRobin"     // config.go:46-47
  val BalancerMurmur2    = "Murmur2Balancer" // config.go:52-53
  val BalancerReferenceHash = "ReferenceHash" // config.go:48-49 (client-side)
  val BalancerCrc32      = "CRC32Balancer"   // config.go:50-51 (client-side)
  val supportedBalancers: Seq[String] =
    Seq(BalancerHash, BalancerRoundRobin, BalancerMurmur2,
      BalancerReferenceHash, BalancerCrc32)
}

/** Snapshot modes (`README.md:59-63`): `initial` takes a snapshot only
  * if none was taken before, then streams; `never` skips straight to
  * CDC; `snapshot_only` takes the snapshot and exits (no CDC stream).
  */
object SnapshotConfig {
  val ModeInitial      = "initial"
  val ModeNever        = "never"
  val ModeSnapshotOnly = "snapshot_only"
  val modes: Seq[String] = Seq(ModeInitial, ModeNever, ModeSnapshotOnly)
}

/** Database-connection config for the JDBC CDC lane (reference
  * `config.Config` Host/Port/Username/Password/Database → one JDBC URL;
  * `connector.go:51-56` builds its CDC stream from exactly this block).
  * `changelog`/`startCursor` drive `graft.sources.jdbc.JdbcCdcSource`;
  * `maxRowsPerBatch` is the admission-control knob (≙ O13 batch size).
  */
final case class JdbcSourceConfig(
    url: String = "",
    changelog: String = "changelog",
    startCursor: Long = 0L,
    numPartitions: Int = 4,
    maxRowsPerBatch: Long = 0L)

/** One published table (reference `cdc.publication.tables[i]`,
  * `README.md:233-236`): name, schema (default `public`), and the
  * replica identity the connector sets on it — `FULL` captures the
  * whole old row on update/delete, `DEFAULT` only the primary key.
  */
final case class PublicationTable(
    name: String,
    schema: String = "public",
    replicaIdentity: String = PublicationTable.IdentityDefault) {
  require(PublicationTable.identities.contains(replicaIdentity),
    s"replicaIdentity must be one of ${PublicationTable.identities.mkString(", ")}, got '$replicaIdentity'")
  def qualified: String = s"$schema.$name"
}

object PublicationTable {
  val IdentityFull = "FULL"
  val IdentityDefault = "DEFAULT"
  val identities: Set[String] = Set(IdentityFull, IdentityDefault)
}

/** PostgreSQL replication-connection block (reference `cdc.host` /
  * `cdc.username` / `cdc.password` / `cdc.database`, `README.md:223-226`)
  * — the endpoint the live replication-protocol lane
  * (`graft.sources.cdc.ReplicationTail`) dials. The reference keeps port
  * inside the upstream engine's default; exposed here explicitly.
  *
  * Bootstrap contract (`README.md:230-239`): `publicationCreateIfNotExists`
  * / `slotCreateIfNotExists` make the connector create the publication
  * (with the configured operations + per-table replica identity) and the
  * logical slot at startup; without the flag a missing object is a loud
  * startup error, exactly the reference's behavior.
  * `slotActivityCheckerIntervalMs` (reference default 1000) paces the
  * slot-health monitor.
  */
final case class PostgresSourceConfig(
    host: String = "",
    port: Int = 5432,
    username: String = "",
    password: String = "",
    database: String = "",
    publicationName: String = "graft_pub",
    publicationCreateIfNotExists: Boolean = false,
    publicationOperations: Seq[String] = PostgresSourceConfig.allOperations,
    publicationTables: Seq[PublicationTable] = Seq.empty,
    slotCreateIfNotExists: Boolean = false,
    slotActivityCheckerIntervalMs: Long = 1000L) {
  require(publicationOperations.nonEmpty &&
    publicationOperations.forall(PostgresSourceConfig.allOperations.contains),
    s"publication.operations must be a non-empty subset of " +
    s"${PostgresSourceConfig.allOperations.mkString(", ")}, got $publicationOperations")
}

object PostgresSourceConfig {
  /** The operation vocabulary the reference accepts
    * (`example/simple/main.go:60-65`: insert/update/delete/truncate).
    */
  val allOperations: Seq[String] = Seq("INSERT", "UPDATE", "DELETE", "TRUNCATE")
}

/** Replica-sink knobs (`sink = "replica"` → streaming/Materialize):
  * key-hash bucket count (size so a bucket is a few GB at the target
  * scale) and the optional data-map field carrying the change's log
  * position for exact merge order under event-time ties.
  */
final case class ReplicaSinkConfig(
    nBuckets: Int = 16,
    seqField: Option[String] = None)

/** Top-level connector config (reference `config.Connector`). */
final case class ConnectorConfig(
    sourceDir: String,                 // CDC event stream directory (file source lane)
    checkpointDir: String,             // ACK ≙ checkpoint commit (SURVEY §2A O14)
    kafka: KafkaSinkConfig,
    snapshot: SnapshotConfig = SnapshotConfig(),
    keyField: String = "id",
    sourceFormat: String = "json",     // "json" | "graft-cdc" | "graft-jdbc-cdc"
    jdbc: JdbcSourceConfig = JdbcSourceConfig(),
    slotName: String = "graft_slot",   // metric label (reference slot_name)
    metricsPort: Option[Int] = None,   // ≙ cdc.metric.port (README.md:229); 0 = ephemeral
    postgres: PostgresSourceConfig = PostgresSourceConfig(),
    // ≙ cdc.debugMode (README.md:227,276): serves a JVM diagnostics
    // endpoint (/debug/threads — the pprof analogue) on the metric port
    debugMode: Boolean = false,
    replica: ReplicaSinkConfig = ReplicaSinkConfig(),
    // Value wire format: "default" = the reference's flat row-image JSON
    // with injected operation (example/simple/main.go:110-139);
    // "debezium" = the public Debezium envelope (before/after/op/ts_ms/
    // source) for byte-compatible consumer migration.
    serializer: String = ConnectorConfig.SerializerDefault,
    // Emit TRUNCATE events to the sink topic (flat lane: null-key record
    // with operation=TRUNCATE; debezium lane: op "t"). Default false =
    // wire parity with the reference (which decodes and silently drops
    // them, connector.go:140-142) and with Debezium's
    // skipped.operations=t. The replica sink consumes truncates
    // UPSTREAM of this knob regardless — this only governs the topic.
    emitTruncates: Boolean = false) {
  require(ConnectorConfig.supportedSerializers.contains(serializer),
    s"unsupported serializer '$serializer': supported are " +
      ConnectorConfig.supportedSerializers.mkString(", "))
}

object ConnectorConfig {
  val SerializerDefault  = "default"
  val SerializerDebezium = "debezium"
  val supportedSerializers: Seq[String] = Seq(SerializerDefault, SerializerDebezium)
}

package graft.app

import java.nio.file.{Files, Paths}

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

/** YAML config front door — the reference is configured by a YAML file
  * with a `cdc:` block (go-pq-cdc `config.Config`: slot, publication,
  * metric port) and a `kafka:` block (camelCase keys,
  * `/root/reference/config/config.go:12-34`); a user switching to this
  * engine keeps that file. Parsing uses snakeyaml off Spark's own
  * classpath; unknown keys are ignored (forward compatibility), known
  * keys map 1:1 onto [[ConnectorConfig]], and defaults match the
  * reference's `SetDefault` (`config.go:68-98`).
  *
  * Engine-specific blocks (`source:`, `snapshot:`, `replica:`) carry
  * what the reference keeps out-of-band (its source is always a live
  * replication slot; ours also runs file/DSv2/JDBC lanes in tests).
  */
object ConfigLoader {

  def fromYamlFile(path: String): ConnectorConfig =
    fromYaml(Files.readString(Paths.get(path)))

  def fromYaml(text: String): ConnectorConfig = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))

    val cdc = asMap(root.get("cdc"))
    val kafka = asMap(root.get("kafka"))
    val source = asMap(root.get("source"))
    val snapshot = asMap(root.get("snapshot"))
    val replica = asMap(root.get("replica"))
    val slot = asMap(cdc.get("slot"))
    val metric = asMap(cdc.get("metric"))
    val publication = asMap(cdc.get("publication"))

    val kafkaCfg = KafkaSinkConfig(
      brokers = seq(kafka.get("brokers")),
      tableTopicMapping = strMap(kafka.get("tableTopicMapping")),
      producerBatchSize = int(kafka.get("producerBatchSize"), 2000),
      producerBatchBytes = kafka.get("producerBatchBytes")
        .map(v => KafkaSinkConfig.parseBytes(v.toString)).getOrElse(1L << 20),
      producerBatchTickerDuration = millis(kafka.get("producerBatchTickerDuration"), 10.seconds),
      requiredAcks = int(kafka.get("requiredAcks"), 1),
      compression = str(kafka.get("compression"), "none"),
      readTimeout = millis(kafka.get("readTimeout"), 30.seconds),
      writeTimeout = millis(kafka.get("writeTimeout"), 30.seconds),
      producerMaxAttempts = int(kafka.get("producerMaxAttempts"), Int.MaxValue),
      clientId = str(kafka.get("clientID"), "graft"),
      allowAutoTopicCreation = bool(kafka.get("allowAutoTopicCreation"), default = false),
      metadataTtl = millis(kafka.get("metadataTTL"), 60.seconds),
      metadataTopics = seq(kafka.get("metadataTopics")),
      secureConnection = bool(kafka.get("secureConnection"), default = false),
      scramUsername = str(kafka.get("scramUsername"), ""),
      scramPassword = str(kafka.get("scramPassword"), ""),
      rootCaPem = str(kafka.get("rootCA"), ""),
      interCaPem = str(kafka.get("interCA"), ""),
      balancer = str(kafka.get("balancer"), KafkaSinkConfig.BalancerHash),
      topicPartitions = int(kafka.get("topicPartitions"), 0))

    // publication.tables[i]: name (+ optional schema, replicaIdentity —
    // reference README.md:233-236; a bare string is shorthand for a
    // public-schema DEFAULT-identity table)
    val pubTableCfgs = publication.get("tables").toSeq.flatMap {
      case l: java.util.List[_] => l.asScala.map {
        case m: java.util.Map[_, _] =>
          val t = asMap(m)
          PublicationTable(
            name = str(t.get("name"), ""),
            schema = str(t.get("schema"), "public"),
            replicaIdentity =
              str(t.get("replicaIdentity"), PublicationTable.IdentityDefault).toUpperCase)
        case v => PublicationTable(name = v.toString)
      }
      case _ => Seq.empty
    }.filter(_.name.nonEmpty)
    // publication tables double as the snapshot table list when the
    // snapshot block doesn't name its own (the reference snapshots what
    // it publishes)
    val pubTables = pubTableCfgs.map(_.name)

    ConnectorConfig(
      sourceDir = str(source.get("dir"), ""),
      checkpointDir = str(source.get("checkpointDir"), ""),
      kafka = kafkaCfg,
      snapshot = SnapshotConfig(
        enabled = bool(snapshot.get("enabled"), default = false),
        mode = str(snapshot.get("mode"), SnapshotConfig.ModeInitial),
        chunkSize = int(snapshot.get("chunkSize"), 10000),
        tables = { val t = seq(snapshot.get("tables")); if (t.nonEmpty) t else pubTables },
        dataDir = str(snapshot.get("dataDir"), "")),
      keyField = str(source.get("keyField"), "id"),
      sourceFormat = str(source.get("format"), "json"),
      jdbc = JdbcSourceConfig(
        url = str(asMap(source.get("jdbc")).get("url"), ""),
        changelog = str(asMap(source.get("jdbc")).get("changelog"), "changelog"),
        startCursor = long(asMap(source.get("jdbc")).get("startCursor"), 0L),
        numPartitions = int(asMap(source.get("jdbc")).get("numPartitions"), 4),
        maxRowsPerBatch = long(asMap(source.get("jdbc")).get("maxRowsPerBatch"), 0L)),
      slotName = str(slot.get("name"), "graft_slot"),
      metricsPort = metric.get("port").map(v => v.toString.toInt),
      postgres = PostgresSourceConfig(
        host = str(cdc.get("host"), ""),
        port = int(cdc.get("port"), 5432),
        username = str(cdc.get("username"), ""),
        password = str(cdc.get("password"), ""),
        database = str(cdc.get("database"), ""),
        publicationName = str(publication.get("name"), "graft_pub"),
        publicationCreateIfNotExists =
          bool(publication.get("createIfNotExists"), default = false),
        publicationOperations = {
          val ops = seq(publication.get("operations")).map(_.toUpperCase)
          if (ops.nonEmpty) ops else PostgresSourceConfig.allOperations
        },
        publicationTables = pubTableCfgs,
        slotCreateIfNotExists = bool(slot.get("createIfNotExists"), default = false),
        slotActivityCheckerIntervalMs =
          long(slot.get("slotActivityCheckerInterval"), 1000L)),
      debugMode = bool(cdc.get("debugMode"), default = false),
      replica = ReplicaSinkConfig(
        nBuckets = int(replica.get("nBuckets"), 16),
        seqField = replica.get("seqField").map(_.toString)),
      serializer = str(kafka.get("serializer"), ConnectorConfig.SerializerDefault),
      // kafka.emitTruncates: emit TRUNCATE events to the topic (default
      // false — reference wire parity / Debezium skipped.operations=t)
      emitTruncates = bool(kafka.get("emitTruncates"), default = false))
  }

  private def asMap(v: Any): Map[String, Any] = v match {
    case Some(x) => asMap(x)
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> vv }.toMap
    case _ => Map.empty
  }

  private def str(v: Option[Any], default: String): String =
    v.map(_.toString).filter(_.nonEmpty).getOrElse(default)

  private def int(v: Option[Any], default: Int): Int =
    v.map(_.toString.toInt).getOrElse(default)

  private def long(v: Option[Any], default: Long): Long =
    v.map(_.toString.toLong).getOrElse(default)

  private def bool(v: Option[Any], default: Boolean): Boolean =
    v.map(_.toString.toBoolean).getOrElse(default)

  private def seq(v: Option[Any]): Seq[String] = v match {
    case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
    case _ => Seq.empty
  }

  private def strMap(v: Option[Any]): Map[String, String] = v match {
    case Some(m: java.util.Map[_, _]) =>
      m.asScala.map { case (k, vv) => k.toString -> vv.toString }.toMap
    case _ => Map.empty
  }

  /** Durations: the reference YAML uses Go duration strings ("100ms",
    * "10s", "1m") or bare nanoseconds; accept both plus bare millis.
    */
  private def millis(v: Option[Any], default: FiniteDuration): FiniteDuration = v match {
    case None => default
    case Some(n: java.lang.Number) => n.longValue().millis
    case Some(s) =>
      val t = s.toString.trim
      val m = "^(\\d+)(ms|s|m|h)$".r
      t match {
        case m(n, "ms") => n.toLong.millis
        case m(n, "s")  => n.toLong.seconds
        case m(n, "m")  => n.toLong.minutes
        case m(n, "h")  => n.toLong.hours
        case _          => t.toLong.millis
      }
  }
}

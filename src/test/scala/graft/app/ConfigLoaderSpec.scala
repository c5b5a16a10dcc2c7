package graft.app

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** YAML config front door: the reference's file shape loads 1:1, engine
  * blocks extend it, defaults match the reference's SetDefault.
  */
class ConfigLoaderSpec extends AnyFunSuite {

  test("the reference benchmark config shape parses field-for-field") {
    // mirrors /root/reference/benchmark/go-pq-cdc-kafka/main.go:37-80
    val cfg = ConfigLoader.fromYaml(
      """cdc:
        |  host: postgres:5432
        |  username: cdc_user
        |  password: cdc_pass
        |  database: cdc_db
        |  publication:
        |    name: cdc_publication
        |    operations: [INSERT, DELETE, TRUNCATE, UPDATE]
        |    tables:
        |      - name: users
        |        replicaIdentity: Full
        |  slot:
        |    name: cdc_slot
        |  metric:
        |    port: 2112
        |kafka:
        |  tableTopicMapping:
        |    public.users: cdc.test.produce
        |  brokers: [redpanda:9092]
        |  allowAutoTopicCreation: true
        |  producerBatchTickerDuration: 100ms
        |  producerBatchSize: 10000
        |  metadataTopics: [cdc.test.produce]
        |""".stripMargin)
    assert(cfg.slotName == "cdc_slot")
    assert(cfg.metricsPort.contains(2112))
    assert(cfg.kafka.brokers == Seq("redpanda:9092"))
    assert(cfg.kafka.tableTopicMapping == Map("public.users" -> "cdc.test.produce"))
    assert(cfg.kafka.allowAutoTopicCreation)
    assert(cfg.kafka.producerBatchTickerDuration == 100.millis)
    assert(cfg.kafka.producerBatchSize == 10000)
    // config.go:22 — accepted for YAML round-trip, subsumed by the Java
    // producer's lazy per-topic metadata (never a sink option)
    assert(cfg.kafka.metadataTopics == Seq("cdc.test.produce"))
    assert(!cfg.kafka.sinkOptions.keys.exists(_.contains("metadata.topics")))
    assert(cfg.snapshot.tables == Seq("users")) // publication tables flow through
    // connection block feeds the live replication lane
    assert(cfg.postgres.host == "postgres:5432")
    assert(cfg.postgres.username == "cdc_user")
    assert(cfg.postgres.password == "cdc_pass")
    assert(cfg.postgres.database == "cdc_db")
    assert(cfg.postgres.publicationName == "cdc_publication")
    assert(cfg.postgres.publicationOperations
      == Seq("INSERT", "DELETE", "TRUNCATE", "UPDATE"))
    assert(cfg.postgres.publicationTables
      == Seq(PublicationTable("users", "public", "FULL")))
    assert(!cfg.debugMode) // README.md:227 default false
  }

  test("publication/slot bootstrap knobs load (reference README.md:230-239)") {
    val cfg = ConfigLoader.fromYaml(
      """cdc:
        |  host: pg
        |  database: app
        |  publication:
        |    name: app_pub
        |    createIfNotExists: true
        |    operations: [insert, update]
        |    tables:
        |      - name: users
        |        replicaIdentity: FULL
        |      - name: books
        |        schema: inventory
        |  slot:
        |    name: app_slot
        |    createIfNotExists: true
        |    slotActivityCheckerInterval: 3000
        |kafka:
        |  brokers: [b:9092]
        |""".stripMargin)
    assert(cfg.postgres.publicationCreateIfNotExists)
    assert(cfg.postgres.publicationOperations == Seq("INSERT", "UPDATE"))
    assert(cfg.postgres.publicationTables == Seq(
      PublicationTable("users", "public", "FULL"),
      PublicationTable("books", "inventory", "DEFAULT")))
    assert(cfg.postgres.slotCreateIfNotExists)
    assert(cfg.postgres.slotActivityCheckerIntervalMs == 3000L)
    // defaults: never create implicitly; checker paces at the reference's 1000ms
    val bare = ConfigLoader.fromYaml("kafka:\n  brokers: [b:9092]\n")
    assert(!bare.postgres.publicationCreateIfNotExists && !bare.postgres.slotCreateIfNotExists)
    assert(bare.postgres.slotActivityCheckerIntervalMs == 1000L)
    // invalid surface fails loudly
    intercept[IllegalArgumentException](ConfigLoader.fromYaml(
      """cdc:
        |  publication:
        |    tables:
        |      - name: t
        |        replicaIdentity: NOTHING
        |kafka:
        |  brokers: [b:9092]
        |""".stripMargin))
    intercept[IllegalArgumentException](ConfigLoader.fromYaml(
      """cdc:
        |  publication:
        |    operations: [UPSERT]
        |kafka:
        |  brokers: [b:9092]
        |""".stripMargin))
  }

  test("cdc.debugMode and cdc.port load; defaults hold when absent") {
    val cfg = ConfigLoader.fromYaml(
      """cdc:
        |  host: pg.internal
        |  port: 5433
        |  database: app
        |  debugMode: true
        |kafka:
        |  brokers: [b:9092]
        |""".stripMargin)
    assert(cfg.debugMode)
    assert(cfg.postgres.port == 5433)
    val bare = ConfigLoader.fromYaml("kafka:\n  brokers: [b:9092]\n")
    assert(!bare.debugMode && bare.postgres.port == 5432)
  }

  test("defaults match the reference SetDefault when keys are absent") {
    val cfg = ConfigLoader.fromYaml("kafka:\n  brokers: [b:9092]\n")
    assert(cfg.kafka.readTimeout == 30.seconds)        // config.go:69-71
    assert(cfg.kafka.writeTimeout == 30.seconds)       // config.go:73-75
    assert(cfg.kafka.producerBatchTickerDuration == 10.seconds) // config.go:77-79
    assert(cfg.kafka.producerBatchSize == 2000)        // config.go:81-83
    assert(cfg.kafka.producerBatchBytes == (1L << 20)) // config.go:85-87
    assert(cfg.kafka.requiredAcks == 1)                // config.go:89-91
    assert(cfg.replica.nBuckets == 16 && cfg.replica.seqField.isEmpty)
    assert(cfg.serializer == ConnectorConfig.SerializerDefault)
    // TRUNCATE emission defaults OFF — reference wire parity even when
    // the publication publishes TRUNCATE (the ops list above includes it)
    assert(!cfg.emitTruncates)
  }

  test("kafka.serializer selects the Debezium envelope lane; unknown values fail loudly") {
    val cfg = ConfigLoader.fromYaml(
      "kafka:\n  brokers: [b:9092]\n  serializer: debezium\n")
    assert(cfg.serializer == ConnectorConfig.SerializerDebezium)
    intercept[IllegalArgumentException](
      ConfigLoader.fromYaml("kafka:\n  brokers: [b:9092]\n  serializer: protobuf\n"))
  }

  test("kafka.emitTruncates opts the sink topic into TRUNCATE records") {
    val cfg = ConfigLoader.fromYaml(
      "kafka:\n  brokers: [b:9092]\n  emitTruncates: true\n")
    assert(cfg.emitTruncates)
  }

  test("engine blocks: source/snapshot/replica knobs load and batch bytes parse human sizes") {
    val cfg = ConfigLoader.fromYaml(
      """source:
        |  dir: /data/stream
        |  checkpointDir: /data/ckpt
        |  format: graft-cdc
        |  keyField: user_id
        |  jdbc:
        |    url: jdbc:derby:memory:t
        |    numPartitions: 8
        |snapshot:
        |  enabled: true
        |  mode: initial
        |  tables: [lineitem, orders]
        |replica:
        |  nBuckets: 32
        |  seqField: lsn
        |kafka:
        |  brokers: [b:9092]
        |  producerBatchBytes: 2mb
        |""".stripMargin)
    assert(cfg.sourceDir == "/data/stream" && cfg.checkpointDir == "/data/ckpt")
    assert(cfg.sourceFormat == "graft-cdc" && cfg.keyField == "user_id")
    assert(cfg.jdbc.url == "jdbc:derby:memory:t" && cfg.jdbc.numPartitions == 8)
    assert(cfg.snapshot.enabled && cfg.snapshot.tables == Seq("lineitem", "orders"))
    assert(cfg.replica == ReplicaSinkConfig(nBuckets = 32, seqField = Some("lsn")))
    assert(cfg.kafka.producerBatchBytes == 2L << 20)
  }
}

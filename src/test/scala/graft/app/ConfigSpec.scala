package graft.app

import org.scalatest.funsuite.AnyFunSuite

/** Config → Kafka sink option rendering, one assertion per reference
  * knob (config.go:12-100, kafka/client.go:53-115). Pure map rendering —
  * no broker needed.
  */
class ConfigSpec extends AnyFunSuite {

  private val base = KafkaSinkConfig(brokers = Seq("b1:9092", "b2:9092"))

  test("producer knobs render to kafka.* options (O13/O19/O22)") {
    val o = base.copy(
      producerBatchSize = 500,
      producerBatchBytes = KafkaSinkConfig.parseBytes("2mb"),
      requiredAcks = -1,
      compression = "zstd",
      producerMaxAttempts = 7,
      clientId = "cdc-77",
      allowAutoTopicCreation = true).sinkOptions
    assert(o("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(o("kafka.batch.size") == "500")
    assert(o("kafka.max.request.size") == (2L << 20).toString)
    assert(o("kafka.acks") == "-1")
    assert(o("kafka.compression.type") == "zstd")
    assert(o("kafka.retries") == "7")
    assert(o("kafka.client.id") == "cdc-77")
    assert(o("kafka.allow.auto.create.topics") == "true")
    assert(o("kafka.metadata.max.age.ms") == "60000") // MetadataTTL default
  }

  test("insecure config renders NO security options") {
    val o = base.sinkOptions
    assert(!o.contains("kafka.security.protocol"))
    assert(!o.contains("kafka.sasl.jaas.config"))
    assert(!o.contains("kafka.ssl.truststore.type"))
  }

  test("secureConnection renders SASL_SSL + SCRAM-SHA-512 + PEM CA pool (client.go:53-115)") {
    val o = base.copy(
      secureConnection = true,
      scramUsername = "cdc_user",
      scramPassword = """p"ss\word""", // must be JAAS-escaped
      rootCaPem = "-----BEGIN CERTIFICATE-----\nROOT\n-----END CERTIFICATE-----",
      interCaPem = "-----BEGIN CERTIFICATE-----\nINTER\n-----END CERTIFICATE-----").sinkOptions
    assert(o("kafka.security.protocol") == "SASL_SSL")
    assert(o("kafka.sasl.mechanism") == "SCRAM-SHA-512") // scram.SHA512
    val jaas = o("kafka.sasl.jaas.config")
    assert(jaas.startsWith("org.apache.kafka.common.security.scram.ScramLoginModule required"))
    assert(jaas.contains("""username="cdc_user""""))
    assert(jaas.contains("""password="p\"ss\\word""""))
    assert(jaas.endsWith(";"))
    // root + intermediate CA both in the pool (AppendCertsFromPEM x2)
    assert(o("kafka.ssl.truststore.type") == "PEM")
    assert(o("kafka.ssl.truststore.certificates").contains("ROOT"))
    assert(o("kafka.ssl.truststore.certificates").contains("INTER"))
    assert(o("kafka.ssl.enabled.protocols") == "TLSv1.2,TLSv1.3") // MinVersion TLS12
  }

  test("balancer mapping (config.go:40-57): hash family default, round-robin explicit") {
    assert(!base.copy(balancer = "Hash").sinkOptions.contains("kafka.partitioner.class"))
    assert(!base.copy(balancer = "Murmur2Balancer").sinkOptions.contains("kafka.partitioner.class"))
    assert(!base.copy(balancer = "").sinkOptions.contains("kafka.partitioner.class"))
    assert(base.copy(balancer = "RoundRobin")
      .sinkOptions("kafka.partitioner.class")
      == "org.apache.kafka.clients.producer.RoundRobinPartitioner")
  }

  test("unsupported balancers are rejected loudly (reference panics too)") {
    val e = intercept[IllegalArgumentException] {
      base.copy(balancer = "LeastBytes").sinkOptions
    }
    assert(e.getMessage.contains("LeastBytes"))
    intercept[IllegalArgumentException](base.copy(balancer = "bogus").sinkOptions)
  }

  test("snapshot modes are the reference's three (README.md:59-63)") {
    assert(SnapshotConfig.modes ==
      Seq(SnapshotConfig.ModeInitial, SnapshotConfig.ModeNever, SnapshotConfig.ModeSnapshotOnly))
  }
}

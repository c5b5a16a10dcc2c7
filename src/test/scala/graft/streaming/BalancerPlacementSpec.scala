package graft.streaming

import java.sql.Timestamp

import scala.concurrent.duration._

import graft.SparkSpec
import graft.app.{ConnectorConfig, KafkaSinkConfig}
import graft.model.ChangeEvent

/** Client-side balancer placement: ReferenceHash and CRC32Balancer emit a
  * `partition` column that matches independent reference implementations
  * of their hashes bit-for-bit — the property that keeps keys on the same
  * partition across a producer→engine switchover.
  */
class BalancerPlacementSpec extends SparkSpec {

  private def events(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => ChangeEvent(
      new Timestamp(1700000000000L), "public", "users",
      null, Map("id" -> i.toString), "INSERT")).toDF()
  }

  private def cfg(balancer: String, parts: Int) = ConnectorConfig(
    sourceDir = "", checkpointDir = "",
    kafka = KafkaSinkConfig(Seq("unused:9092"),
      tableTopicMapping = Map("public.users" -> "t"),
      producerBatchTickerDuration = 1.second,
      balancer = balancer, topicPartitions = parts))

  // independent FNV-1a 32 (written from the published constants, not the
  // production code path)
  private def fnv(bytes: Array[Byte]): Int =
    bytes.foldLeft(0x811c9dc5)((h, b) => (h ^ (b & 0xff)) * 0x01000193)

  private def crc(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(bytes); c.getValue
  }

  test("CRC32Balancer: partition == crc32(key) % n, in range") {
    val out = CdcPipeline.defaultTransform(events(50), cfg(KafkaSinkConfig.BalancerCrc32, 4))
      .select("key", "partition").collect()
    assert(out.length == 50)
    out.foreach { r =>
      val expected = (crc(r.getAs[Array[Byte]]("key")) % 4).toInt
      assert(r.getInt(1) == expected && r.getInt(1) >= 0 && r.getInt(1) < 4)
    }
    // keys actually spread over partitions (placement, not a constant)
    assert(out.map(_.getInt(1)).distinct.length > 1)
  }

  test("ReferenceHash: partition == (fnv1a32(key) & 0x7fffffff) % n") {
    val out = CdcPipeline.defaultTransform(events(50), cfg(KafkaSinkConfig.BalancerReferenceHash, 8))
      .select("key", "partition").collect()
    out.foreach { r =>
      val expected = (fnv(r.getAs[Array[Byte]]("key")) & 0x7fffffff) % 8
      assert(r.getInt(1) == expected && r.getInt(1) >= 0 && r.getInt(1) < 8)
    }
    assert(out.map(_.getInt(1)).distinct.length > 1)
  }

  test("default balancers emit no partition column; LeastBytes still rejected") {
    val plain = CdcPipeline.defaultTransform(events(3), cfg(KafkaSinkConfig.BalancerHash, 0))
    assert(!plain.columns.contains("partition"))
    intercept[IllegalArgumentException](
      cfg("LeastBytes", 4).kafka.sinkOptions)
    // client-side balancers without a partition count fail loudly
    intercept[IllegalArgumentException](
      cfg(KafkaSinkConfig.BalancerCrc32, 0).kafka.sinkOptions)
  }

  test("serializer = debezium: the sink contract carries envelope values, binary-typed") {
    val c = cfg(KafkaSinkConfig.BalancerHash, 0)
      .copy(serializer = ConnectorConfig.SerializerDebezium)
    val out = CdcPipeline.defaultTransform(events(2), c)
    assert(out.schema("key").dataType.typeName == "binary")
    assert(out.schema("value").dataType.typeName == "binary")
    val vals = out.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).sorted
    assert(vals.forall(v => v.startsWith("""{"before":null,"after":{"id":"""") &&
      v.contains(""""op":"c"""") && v.contains(""""ts_ms":1700000000000""") &&
      v.contains(""""source":{"connector":"graft","schema":"public","table":"users"}""")))
    // placement still composes with the envelope lane (hashes the binary key)
    val placed = CdcPipeline.defaultTransform(events(10),
      c.copy(kafka = c.kafka.copy(balancer = KafkaSinkConfig.BalancerCrc32, topicPartitions = 4)))
      .select("key", "partition").collect()
    placed.foreach { r =>
      assert(r.getInt(1) == (crc(r.getAs[Array[Byte]](0)) % 4).toInt)
    }
    // unknown serializers fail loudly at construction
    intercept[IllegalArgumentException](c.copy(serializer = "avro"))
  }
}

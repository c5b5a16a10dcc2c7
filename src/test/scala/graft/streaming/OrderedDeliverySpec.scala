package graft.streaming

import java.sql.Timestamp

import scala.concurrent.duration._

import graft.SparkSpec
import graft.app.{ConnectorConfig, KafkaSinkConfig}
import graft.model.{ChangeEvent, Op}

/** Per-key ordered delivery (CdcPipeline.orderedTransform): every routing
  * key lands in ONE sink partition with its records in event-time order —
  * the per-key narrowing of the reference's per-slot WAL order that a
  * keyed Kafka topic can express.
  */
class OrderedDeliverySpec extends SparkSpec {

  private val cfg = ConnectorConfig(
    sourceDir = "", checkpointDir = "",
    kafka = KafkaSinkConfig(
      brokers = Seq("unused:9092"),
      tableTopicMapping = Map("public.users" -> "users-topic"),
      producerBatchTickerDuration = 250.millis),
    keyField = "id")

  private def ev(id: Int, atMs: Long): ChangeEvent =
    ChangeEvent(new Timestamp(atMs), "public", "users",
      null, Map("id" -> id.toString, "v" -> atMs.toString), Op.Insert)

  test("each key is colocated in one partition with records in event order") {
    import spark.implicits._
    // 5 keys x 20 events, deliberately interleaved and time-shuffled
    val events = (for (i <- 0 until 20; k <- 1 to 5)
      yield ev(k, 1700000000000L + ((i * 7919) % 20) * 1000L)).toDF()
    val out = CdcPipeline.orderedTransform(events, cfg)
    assert(out.columns.toSeq == Seq("topic", "key", "value", "headers"))

    val perPartition = out
      .selectExpr("cast(key AS string) AS k", "cast(value AS string) AS v")
      .rdd.mapPartitionsWithIndex { case (pid, rows) =>
        rows.map(r => (pid, r.getString(0), r.getString(1)))
      }.collect()

    // colocation: every key appears in exactly one partition
    val partitionsPerKey = perPartition.groupBy(_._2).map { case (_, rs) =>
      rs.map(_._1).distinct.length
    }
    assert(partitionsPerKey.forall(_ == 1))

    // order: within its partition, each key's v-sequence is non-decreasing
    perPartition.groupBy(_._2).foreach { case (k, rs) =>
      val vs = rs.map(r => """"v":"(\d+)"""".r.findFirstMatchIn(r._3).get.group(1).toLong)
      assert(vs.sameElements(vs.sorted), s"key $k out of order: ${vs.toSeq}")
    }
  }
}

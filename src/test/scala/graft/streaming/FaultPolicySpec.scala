package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.streaming.FaultPolicy.{Fatal, Transient}

/** O15 error classification (reference `kafka/reponse_handler.go:26-48`)
  * and the restart supervisor: transient faults restart the query from
  * its checkpoint (no loss, no dup), fatal faults stop the connector.
  */
class FaultPolicySpec extends SparkSpec {

  test("classify mirrors isFatalError's decision table") {
    // reponse_handler.go:37-39 — UnknownTopicOrPartition is permanent
    assert(FaultPolicy.classify(
      new RuntimeException("UnknownTopicOrPartition: topic 'x' missing")) == Fatal)
    // :41-45 — conn-reset errno family + unexpected EOF are transient
    assert(FaultPolicy.classify(new java.io.IOException("Connection reset by peer")) == Transient)
    assert(FaultPolicy.classify(new java.io.IOException("Connection refused")) == Transient)
    assert(FaultPolicy.classify(new java.io.IOException("Broken pipe")) == Transient)
    assert(FaultPolicy.classify(new java.io.EOFException()) == Transient)
    // retriable kafka family (Temporary() analog)
    assert(FaultPolicy.classify(
      new RuntimeException("NotLeaderOrFollowerException: leader moved")) == Transient)
    // :47 — unknown errors default to fatal
    assert(FaultPolicy.classify(new RuntimeException("some novel failure")) == Fatal)
    // the classification walks the cause chain (Spark wraps sink errors)
    assert(FaultPolicy.classify(new RuntimeException("query failed",
      new RuntimeException("wrapper", new java.io.IOException("Connection reset")))) == Transient)
    assert(FaultPolicy.classify(new RuntimeException("query failed",
      new RuntimeException("UnknownTopicOrPartition"))) == Fatal)
  }

  private def writeInput(dir: java.nio.file.Path, name: String, ids: Range): Unit =
    Files.write(dir.resolve(name),
      ids.map(i => s"""{"id":$i}""").mkString("\n").getBytes)

  test("supervise restarts on transient fault from checkpoint: no loss, no dup") {
    val src = Files.createTempDirectory("fp-src")
    val chk = Files.createTempDirectory("fp-chk")
    writeInput(src, "a.json", 0 until 5)
    val attempts = new AtomicInteger(0)
    val delivered = new ConcurrentLinkedQueue[Long]()

    val outcome = FaultPolicy.supervise(maxRestarts = 3) { () =>
      spark.readStream.schema("id LONG").json(src.toString)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk.toString)
        .foreachBatch { (df: DataFrame, _: Long) =>
          // first delivery attempt dies like a dropped broker connection
          if (attempts.getAndIncrement() == 0)
            throw new java.io.IOException("Connection reset by peer")
          df.collect().foreach(r => delivered.add(r.getLong(0)))
        }
        .start()
    }
    assert(outcome.restarts == 1)
    assert(outcome.fatal.isEmpty)
    // the failed attempt's batch was not committed -> redelivered once
    val got = delivered.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
    assert(got == (0L until 5L), s"delivered=$got")
  }

  test("supervise rethrows on fatal fault (the reference's panic)") {
    val src = Files.createTempDirectory("fp-src2")
    val chk = Files.createTempDirectory("fp-chk2")
    writeInput(src, "a.json", 0 until 3)
    val attempts = new AtomicInteger(0)

    val thrown = intercept[Throwable] {
      FaultPolicy.supervise(maxRestarts = 3) { () =>
        spark.readStream.schema("id LONG").json(src.toString)
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", chk.toString)
          .foreachBatch { (_: DataFrame, _: Long) =>
            attempts.incrementAndGet()
            throw new RuntimeException("UnknownTopicOrPartition: no such topic")
          }
          .start()
      }
    }
    assert(FaultPolicy.classify(thrown) == Fatal)
    assert(attempts.get() == 1) // no retry on permanent errors
  }
}

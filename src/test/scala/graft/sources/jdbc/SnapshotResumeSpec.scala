package graft.sources.jdbc

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.TaskContext

import graft.SparkSpec

/** PROOF of the §2A S2 subsumption claim: the reference's chunk
  * claim/heartbeat/resume bookkeeping (`README.md:242-248`) collapses
  * into Spark task scheduling + all-or-nothing job commit. Two kill
  * shapes against a live chunked JDBC snapshot:
  *
  *  1. a chunk's task attempt dies mid-read → Spark re-claims the chunk
  *     (task retry re-runs that partition's range query) and the
  *     completed snapshot has no gap and no duplicate;
  *  2. the whole snapshot job dies partway → the failed run commits
  *     NOTHING visible (FileOutputCommitter discards uncommitted task
  *     output), and the restarted run delivers every row exactly once —
  *     no gap, no dup across the kill/restart boundary.
  */
class SnapshotResumeSpec extends SparkSpec {

  private def freshDb(name: String, rows: Int): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (id INT PRIMARY KEY, name VARCHAR(50))")
    (1 to rows).foreach(i => st.execute(s"INSERT INTO people VALUES ($i, 'p$i')"))
    st.close(); conn.close()
    url
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.selectExpr("CAST(newData['id'] AS INT) AS id").collect().map(_.getInt(0)).toSeq

  test("a chunk task killed mid-read is re-claimed by retry: no gap, no dup") {
    val url = freshDb("snapres1", 100)
    // 100 ids / chunkSize 25 → 4 chunks (JDBC partitions)
    val events = JdbcSnapshot.snapshotChunked(spark, url, "people", "id", 1, 100, 25)
    SnapshotResumeSpec.killOnce.set(true)
    // the failure injection sits in the same stage as the JDBC read, so
    // the retried attempt re-runs the chunk's range query from scratch
    val survived = events.toJavaRDD.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() == 2 && tc.attemptNumber() == 0 &&
          SnapshotResumeSpec.killOnce.getAndSet(false))
        throw new RuntimeException("chunk worker died mid-read (injected)")
      it
    }
    val got = survived.collect().map(_.getAs[Map[String, String]]("newData")("id").toInt)
    assert(got.sorted.toSeq == (1 to 100), "retry must re-deliver the killed chunk exactly once")
  }

  test("a snapshot job killed partway restarts with no gap and no dup (green twice)") {
    val url = freshDb("snapres2", 80)
    val out = Files.createTempDirectory("snapres-out").resolve("snap").toString
    def snapshotWithInjection(): Unit =
      JdbcSnapshot.snapshotChunked(spark, url, "people", "id", 1, 80, 20)
        .toJavaRDD.rdd.mapPartitions { it =>
          if (SnapshotResumeSpec.failRun.get() && TaskContext.get().partitionId() == 3)
            throw new RuntimeException("snapshot process killed (injected)")
          it
        }.map(_.getAs[Map[String, String]]("newData")("id").toInt)
        .toDF("id").write.mode("append").parquet(out)

    // run 1: dies on chunk 3 on every attempt — the job fails
    SnapshotResumeSpec.failRun.set(true)
    intercept[Exception](snapshotWithInjection())
    // nothing from the dead run is visible to a reader (no partial chunk)
    val committed =
      try spark.read.parquet(out).count() catch { case _: Exception => 0L }
    assert(committed == 0L, "a killed snapshot job must not leave committed partial output")

    // run 2: the restart — every row exactly once
    SnapshotResumeSpec.failRun.set(false)
    snapshotWithInjection()
    val got = spark.read.parquet(out).collect().map(_.getInt(0))
    assert(got.sorted.toSeq == (1 to 80), "restart must deliver every row exactly once")
  }

  private implicit def toDfHelper(rdd: org.apache.spark.rdd.RDD[Int]): DfHelper =
    new DfHelper(rdd)
  private class DfHelper(rdd: org.apache.spark.rdd.RDD[Int]) {
    def toDF(col: String): org.apache.spark.sql.DataFrame = {
      val s = spark
      import s.implicits._
      s.createDataset(rdd).toDF(col)
    }
  }
}

object SnapshotResumeSpec {
  // JVM-wide flags: tasks run in-process under local mode, so the injected
  // failure is visible to executor threads without serialization tricks
  val killOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
  val failRun = new java.util.concurrent.atomic.AtomicBoolean(false)
}

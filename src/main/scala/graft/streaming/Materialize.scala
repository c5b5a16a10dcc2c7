package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.Op

/** Streaming CDC apply: maintain a QUERYABLE replica table from the
  * change-event stream — the downstream half the reference delegates to
  * Kafka consumers (its pipeline ends at the topic; a real deployment's
  * next hop is exactly this materialization). q46 defines the apply
  * semantics as a batch query (latest change per key, deletes drop the
  * row); this lane keeps that result continuously up to date.
  *
  * Layout and cost model (the Hudi/Iceberg copy-on-write shape, built
  * from parquet + dynamic partition overwrite): the replica is hash-
  * bucketed by key into `nBuckets` directory partitions. A micro-batch
  *   1. collapses to its latest change per key (one small shuffle,
  *      batch-sized);
  *   2. computes the touched bucket set (≤ nBuckets, driver-side);
  *   3. reads ONLY the touched buckets of the current replica
  *      (partition-pruned scan);
  *   4. merges — incoming beats existing at equal event time, so
  *      at-least-once redelivery is idempotent — and drops deleted keys;
  *   5. rewrites ONLY the touched buckets (dynamic partition overwrite).
  * At 100 TB the per-batch write cost is (touched buckets) ×
  * (bucket size), independent of table size; size nBuckets so a bucket
  * is a few GB and a typical batch touches a fraction of them.
  *
  * Exactly-once effect: the sink is idempotent (re-applying any prefix
  * of delivered batches reproduces the same files), so the streaming
  * checkpoint's at-least-once redelivery composes to exactly-once
  * replica state — same argument as the reference's ACK-after-flush
  * (`/root/reference/connector.go` checkpoint discipline), shifted from
  * Kafka offsets to table state.
  */
object Materialize {

  /** Replica schema: key, latest data map, its event time, bucket. */
  private val KeyCol = "k"

  /** Start continuously applying `events` (ChangeEvent schema) into the
    * replica at `tablePath`, keyed by `keyField` (a data-map key, e.g.
    * the table's PK column).
    */
  def applyStream(events: DataFrame, keyField: String, tablePath: String,
      checkpoint: String, nBuckets: Int = 16): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        applyBatch(batch.toDF(), keyField, tablePath, nBuckets)
      }
      .start()

  /** Apply one batch of change events to the replica (idempotent). */
  def applyBatch(batch: DataFrame, keyField: String, tablePath: String,
      nBuckets: Int = 16): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    // latest change per key within the batch; DELETE carries its key in
    // the pre-image when the post-image is empty (replica identity)
    val wBatch = Window.partitionBy(col(KeyCol)).orderBy($"eventTime".desc, $"op")
    val upserts = batch
      .withColumn(KeyCol,
        coalesce(element_at($"newData", keyField), element_at($"oldData", keyField)))
      .filter(col(KeyCol).isNotNull)
      .withColumn("rn", row_number().over(wBatch))
      .filter($"rn" === 1)
      .select(col(KeyCol), $"op", $"newData".as("data"), $"eventTime".as("event_time"))
      .withColumn("bucket", pmod(xxhash64(col(KeyCol)), lit(nBuckets)).cast("int"))
    // touched buckets: ≤ nBuckets ints — bounded driver-side by design
    val touched = upserts.select($"bucket").distinct().collect().map(_.getInt(0))
    if (touched.isEmpty) return
    val fs = new Path(tablePath).getFileSystem(s.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(new Path(tablePath)))
        s.read.parquet(tablePath)
          .filter($"bucket".isin(touched.toIndexedSeq.map(Integer.valueOf): _*))
          .withColumn("op", lit("EXISTING"))
          .select(col(KeyCol), $"op", $"data", $"event_time", $"bucket")
          // materialize BEFORE the overwrite below: truncating lineage here
          // is what makes read-then-overwrite-the-same-path safe
          .localCheckpoint(true)
      else upserts.limit(0)
    // merge: newest event time wins; at equal time the INCOMING change
    // wins (op sorts before "EXISTING"), so re-applying a batch that
    // already landed rewrites identical rows — idempotence under
    // at-least-once redelivery
    val wMerge = Window.partitionBy(col(KeyCol))
      .orderBy($"event_time".desc, ($"op" === "EXISTING").asc)
    val merged = existing.unionByName(upserts)
      .withColumn("rn", row_number().over(wMerge))
      .filter($"rn" === 1 && $"op" =!= Op.Delete)
      .select(col(KeyCol), $"data", $"event_time", $"bucket")
      .localCheckpoint(true) // one computation feeds both the write and the empty-bucket probe
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic") // only touched buckets
      .partitionBy("bucket")
      .parquet(tablePath)
    // dynamic overwrite only replaces partitions PRESENT in the output: a
    // touched bucket whose merged content is now empty (every key deleted)
    // would silently keep its stale file — drop those directories explicitly
    val stillWritten = merged.select($"bucket").distinct().collect().map(_.getInt(0)).toSet
    (touched.toSet -- stillWritten).foreach { b =>
      fs.delete(new Path(tablePath, s"bucket=$b"), true)
    }
  }

  /** The replica as a DataFrame: current row per live key. */
  def replica(s: SparkSession, tablePath: String): DataFrame =
    s.read.parquet(tablePath).select(col(KeyCol), col("data"), col("event_time"))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the storage-side half of shuffle elimination
  * (SURVEY §4 "partition pruning"/co-location; the 100 TB join strategy
  * the prompt's own design notes call out): persisting both sides of a
  * recurring join bucketed (and sorted) by the join key means every
  * future join between them is map-side — no Exchange, and with sorted
  * buckets no Sort either, just a zip of co-numbered buckets.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * on every analytical run and paying the shuffle ONCE at ingest: the
  * CDC pipeline (or compaction job) writes its output bucketed by the
  * natural join key, and the entire downstream query family inherits
  * co-location.
  */
object Bucketing {

  /** Persist a frame as a bucketed+sorted table in the session catalog.
    * Bucket count is the join-parallelism knob: both sides of a
    * co-located join must agree on it (classic layout-contract, enforced
    * by the catalog metadata).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — resolves through the
    * catalog so Spark sees the bucket spec and plans the exchange-free
    * join.
    */
  def cosortedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}

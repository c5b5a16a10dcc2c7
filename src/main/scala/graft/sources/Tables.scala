package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch snapshot reads of the testdata star schema.
  *
  * Mirrors the reference's snapshot source semantics (chunked consistent
  * read of existing rows — /root/reference/example/snapshot/main.go:90-98,
  * README.md:59-63): in Spark a partitioned columnar scan IS the chunked
  * snapshot — each parquet row-group/file-split is one "chunk", claimed by
  * a task, retried on failure, with no coordinator bookkeeping needed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table.
    *
    * `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL). We read nanos
    * as a raw long (`nanosAsLong`) and floor-divide to microseconds —
    * byte-identical to what DuckDB does natively (its parquet reader
    * truncates NANOS to a µs TIMESTAMP), so oracle comparisons stay exact.
    *
    * Floor (not `div`, which truncates toward zero) so a pre-epoch
    * nanosecond value would land in the earlier microsecond, matching
    * timestamp semantics; the two agree on every post-1970 fixture value.
    */
  /** Register every table as a temp view so the whole engine surface is
    * reachable through `spark.sql(...)` — the SQL front door next to the
    * DataFrame one. Views go through [[load]], so the nanos-timestamp
    * normalization applies identically in both lanes.
    */
  def createViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // session-global conf: set once per session, not per call
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Older driver-generated data stores events.ts as TIMESTAMP(NANOS),
    // which surfaces as a raw long under nanosAsLong; newer data is
    // native µs WITHOUT a timezone, which Spark reads as TIMESTAMP_NTZ.
    // Dispatch on the read type: nanos-long → floor to µs; NTZ → cast to
    // session-local TIMESTAMP (the session TZ is pinned to UTC in every
    // entry point, so the cast relabels without shifting — exactly how
    // the DuckDB oracle reads the same naive column).
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("(ts - ((ts % 1000) + 1000) % 1000) div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }
}

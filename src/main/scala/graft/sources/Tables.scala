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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

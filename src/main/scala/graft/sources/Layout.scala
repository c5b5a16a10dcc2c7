package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Multi-dimensional data layout (`OPTIMIZE ZORDER`-style): rewrite a
  * table sorted by the Morton code of two dimension columns, so that
  * files (and parquet row groups inside them) cover small rectangles of
  * the (x, y) space instead of horizontal stripes. A range predicate on
  * EITHER dimension then prunes most files by min-max stats — single-
  * dimension sorting only serves predicates on the leading column.
  *
  * Scale shape: one `repartitionByRange` shuffle on the z-value (range
  * partitioning keeps output files non-overlapping in z, which is what
  * makes the min-max bounds tight) plus an in-partition sort — the same
  * cost as any global sort of the table, paid once per layout pass.
  */
object Layout {

  /** Write `df` to `path` z-ordered by (x, y) into `nFiles` files. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, path: String, nFiles: Int): Unit = {
    val z = ZOrder.zValue(x, y)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Mean per-file bounding-box area over (x, y) — the locality metric a
    * layout pass is judged by: tight boxes mean range predicates on
    * either dimension skip most files. Reads only footers + the two
    * dimension columns.
    */
  def meanFileBoxArea(s: SparkSession, path: String, x: String, y: String): Double = {
    import s.implicits._
    s.read.parquet(path)
      .groupBy(input_file_name())
      .agg(((max(col(x)) - min(col(x))).cast("double") *
        (max(col(y)) - min(col(y))).cast("double")).as("area"))
      .agg(avg($"area")).as[Double].head()
  }
}

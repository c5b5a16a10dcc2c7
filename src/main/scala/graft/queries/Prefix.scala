package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed global-prefix pattern (q148/q163/q164b/q294): range
  * partition on the order key, compute each partition's global offset
  * from the per-partition totals, and let callers finish with a
  * partition-LOCAL window (row_number or running sum) plus a broadcast
  * join — never a data-sized single-partition WindowExec.
  *
  * The per-partition totals frame is the ONE place this library runs
  * an unpartitioned window, and it is safe only because the frame is
  * bounded by the shuffle-partition count. That property was
  * previously argued per call site (plan-audit laws); this helper
  * makes it structural AND asserts it at runtime: the prefix
  * projection carries an `assert_true(row_number ≤ bound)` guard, so
  * a future call site that feeds a data-sized frame through the
  * unpartitioned window fails loudly mid-job instead of silently
  * planning the scale-killer. The expected `WindowExec: No Partition
  * Defined` warnings in Verify logs all originate here, over frames
  * this guard proves ≤ `parts` rows.
  */
object Prefix {

  /** Range-partition `df` by `order` and return (ranged, offsets):
    * `ranged` = df with a `pid` column (partition id under the new
    * range partitioning); `offsets` = (pid, off) where `off` is the
    * sum of `weight` over all EARLIER partitions — pass `lit(1L)` for
    * row-count offsets (global row_number) or a count column for
    * weighted offsets (global cumulative sums, the q294 median).
    * Callers should `broadcast(offsets)` into their rank join and are
    * responsible for checkpointing an expensive `df` first
    * (repartitionByRange samples its child — the q148 lesson).
    */
  def boundedPrefix(df: DataFrame, parts: Int, weight: Column,
      order: Column*): (DataFrame, DataFrame) =
    boundedPrefixW(df, parts, Seq("off" -> weight), order: _*)

  /** Multi-weight form: one prefix-offset column per (name, weight)
    * pair — e.g. the q144 KS statistic needs separate per-class
    * offsets, q202's Lorenz curve a count AND a revenue offset, from
    * ONE range partitioning. The bound guard rides the first column.
    */
  def boundedPrefixW(df: DataFrame, parts: Int,
      weights: Seq[(String, Column)], order: Column*): (DataFrame, DataFrame) = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("pid", spark_partition_id())
    val aggs = weights.map { case (n, c) => sum(c).as("_pn_" + n) }
    val counts = ranged.groupBy(col("pid")).agg(aggs.head, aggs.tail: _*)
    (ranged, offsetsOfW(counts, weights.map(_._1), parts))
  }

  /** Prefix offsets of a partition-bounded totals frame (pid, pn) —
    * the sanctioned unpartitioned-window call site. The runtime guard
    * rides the same projection (zero extra jobs): if more than `bound`
    * rows reach the window, `assert_true` aborts the job with a
    * message naming this contract.
    */
  def offsetsOf(counts: DataFrame, bound: Int): DataFrame =
    offsetsOfW(counts.withColumnRenamed("pn", "_pn_off"), Seq("off"), bound)

  def offsetsOfW(counts: DataFrame, names: Seq[String], bound: Int): DataFrame = {
    val w = Window.orderBy(col("pid"))
    val staged = counts.select(col("pid") +:
      row_number().over(w).as("_brn") +:
      names.map(n => coalesce(sum(col("_pn_" + n)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_off_" + n)): _*)
    val guard = coalesce(
      assert_true(col("_brn") <= lit(bound),
        lit(s"boundedPrefix: unpartitioned prefix window received more " +
          s"than $bound rows — the caller fed a data-sized frame where " +
          "a partition-bounded totals frame is required")).cast("long"),
      lit(0L))
    staged.select(col("pid") +:
      names.zipWithIndex.map { case (n, i) =>
        (if (i == 0) col("_off_" + n) + guard else col("_off_" + n)).as(n)
      }: _*)
  }
}

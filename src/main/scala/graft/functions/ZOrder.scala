package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving of two 16-bit dimensions — the standard
  * multi-dimensional clustering key for columnar layouts (the public
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`): sorting a table
  * by z-value co-locates rows that are close in BOTH dimensions, so
  * range predicates on either dimension prune parquet row groups /
  * files via min-max stats instead of scanning everything.
  *
  * Pure built-in column ops (bitwise and/or/shift over BIGINT) — the
  * classic mask-spread bit-twiddling chain, fully fused by whole-stage
  * codegen; a custom Expression would buy nothing here.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a long:
    * 0b…dcba → 0b…0d0c0b0a.
    */
  private def spread(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of (x, y): x's bits on even positions, y's on odd.
    * Inputs are truncated to their low 16 bits (callers bucket or scale
    * wider domains first — at 100 TB the dimensions are quantile-bucketed
    * ids, not raw values).
    */
  def zValue(x: Column, y: Column): Column =
    spread(x.cast("long")).bitwiseOR(shiftleft(spread(y.cast("long")), 1))
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-arithmetic conventions shared by every oracle-checked query.
  *
  * The driver's gate compares Spark output to DuckDB output value-for-value
  * (tools/check.py), so every floating-point aggregate must be computed via
  * exact DECIMAL intermediates: decimal addition is associative, hence
  * partition/shuffle order cannot perturb the result, and the one final
  * cast-to-double is deterministic and identical across engines.
  *
  * Rule: cast SOURCE columns (exact 2-decimal money values) to decimal
  * early, keep all arithmetic decimal, cast to double exactly once at the
  * end. Never cast a COMPUTED double to decimal — engines round differently.
  */
object Exact {
  val dec2: DecimalType = DecimalType(12, 2)

  /** Exact image of a 2-decimal money/quantity double column. */
  def d2(c: Column): Column = c.cast(dec2)

  /** `1 - c` / `1 + c` in exact decimal, for discount/tax factors. */
  def oneMinus(c: Column): Column = lit(1).cast(DecimalType(3, 2)) - c.cast(DecimalType(4, 2))
  def onePlus(c: Column): Column  = lit(1).cast(DecimalType(3, 2)) + c.cast(DecimalType(4, 2))

  /** Exact decimal sum rendered as double (the cross-engine-stable form). */
  def dsum(c: Column): Column = sum(d2(c)).cast("double")

  /** SQL fragments mirroring the Scala helpers exactly. */
  def sqlD2(col: String): String       = s"CAST($col AS DECIMAL(12,2))"
  def sqlOneMinus(col: String): String = s"(CAST(1 AS DECIMAL(3,2)) - CAST($col AS DECIMAL(4,2)))"
  def sqlOnePlus(col: String): String  = s"(CAST(1 AS DECIMAL(3,2)) + CAST($col AS DECIMAL(4,2)))"
  def sqlDsum(col: String): String     = s"CAST(SUM(${sqlD2(col)}) AS DOUBLE)"
}

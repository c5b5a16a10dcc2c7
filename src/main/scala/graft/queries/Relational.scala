package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Relational operator surface (SURVEY §2B) as thin, oracle-checked wrappers
  * over Spark built-ins.
  *
  * Determinism conventions (so the DuckDB oracle hash-matches bit-for-bit):
  *   - double aggregates go through exact DECIMAL intermediates (decimal sums
  *     are associative ⇒ shuffle/partition order cannot change the result),
  *     then a single deterministic cast back to double;
  *   - every query ends with a total-order sort on its output key;
  *   - counts/sums of integers are BIGINT on both sides.
  */
object Relational {

  /** Exact-decimal images of the 2-decimal money columns. Cast the SOURCE
    * double to decimal (values are exact 2-decimal quantities, far from any
    * rounding boundary ⇒ portable across engines), then keep ALL arithmetic
    * in decimal — decimal ops are exact in both Spark and DuckDB, so the
    * final cast-to-double matches bit-for-bit. Casting a *computed* double
    * to a high-scale decimal is NOT portable (DuckDB rounds via double
    * multiply, Spark via exact BigDecimal).
    */
  private val dec2 = DecimalType(12, 2)

  /** TPC-H Q1-shaped pricing summary: partial (map-side) aggregation is
    * automatic; at 100 TB the only shuffle is the 4-group exchange.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qty  = $"l_quantity".cast(dec2)
    val ep   = $"l_extendedprice".cast(dec2)
    val disc = $"l_discount".cast(DecimalType(4, 2))
    val tax  = $"l_tax".cast(DecimalType(4, 2))
    val one  = lit(1).cast(DecimalType(3, 2))
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (one - disc)).cast("double").as("sum_disc_price"),
        sum(ep * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}

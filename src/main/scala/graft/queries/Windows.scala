package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Exact._

/** Window-function surface (SURVEY §2B): ranking, running aggregates,
  * lag/lead, per-group top-k, CDC latest-by-key compaction, and gap-based
  * sessionization.
  *
  * Every window order includes a unique tiebreaker column so results are
  * deterministic under any partitioning. At 100 TB a window shuffles once
  * on its partition key — same cost shape as a groupBy on that key.
  */
object Windows {

  /** Ranking trio + per-group top-k: top-3 customers by balance per nation. */
  def q7RankTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.load(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter($"rn" <= 3)
      .select($"c_nationkey", $"rn", $"rnk", $"drnk", $"c_custkey", $"c_acctbal")
      .orderBy($"c_nationkey", $"rn")
  }

  /** Relative-position window functions (the rank family's normalized
    * cousins): percent_rank = (rank−1)/(n−1) and cume_dist = |≤row|/n —
    * doubles, but each computed from exact integer rank/count in one
    * expression, identically in both engines (the q53 discipline applied
    * to window functions).
    */
  def q74PctRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.load(s, dir, "customer")
      .withColumn("pct_rnk", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select($"c_nationkey", $"c_custkey", $"c_acctbal", $"pct_rnk", $"cume")
      .orderBy($"c_nationkey", $"c_custkey")
  }

  val q74PctRankSql: String =
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS pct_rnk,
      |  CUME_DIST()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS cume
      |FROM customer
      |ORDER BY c_nationkey, c_custkey""".stripMargin

  val q7RankTopNSql: String =
    """SELECT c_nationkey, rn, rnk, drnk, c_custkey, c_acctbal
      |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
      |        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |        RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
      |        DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk
      |      FROM customer)
      |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin

  /** Running (cumulative) sum per customer over order history, in exact
    * decimal so accumulation order cannot perturb the double rendering.
    */
  def q8RunningSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "orders")
      .filter($"o_custkey" % 10 === 0)
      .withColumn("running_spend", sum(d2($"o_totalprice")).over(w).cast("double"))
      .withColumn("order_seq", row_number().over(
        Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")))
      .select($"o_custkey", $"order_seq", $"o_orderkey", $"running_spend")
      .orderBy($"o_custkey", $"order_seq")
  }

  val q8RunningSumSql: String =
    """SELECT o_custkey, order_seq, o_orderkey, running_spend
      |FROM (SELECT o_custkey, o_orderkey,
      |        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      |      FROM orders WHERE o_custkey % 10 = 0)
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** lag/lead over the per-user event timeline (value passes through
    * untouched — no float arithmetic, so exact equality holds).
    */
  def q9LagLead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_value", lead($"value", 1).over(w))
      .withColumn("first_type", first($"event_type").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"user_id", $"event_id", $"value", $"prev_value", $"next_value", $"first_type")
      .orderBy($"user_id", $"event_id")
  }

  val q9LagLeadSql: String =
    """SELECT user_id, event_id, value,
      |  LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |  FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Frame-boundary value functions — last_value and nth_value, which
    * q9's lag/lead/first family leaves uncovered, with the frame spelled
    * EXPLICITLY: the default frame stops at CURRENT ROW, so a
    * "last value per partition" needs UNBOUNDED FOLLOWING or it silently
    * returns the current row's value (the classic window footgun, pinned
    * here on both engines). Value functions SELECT rather than
    * accumulate, so doubles stay exact cross-engine.
    */
  def q78FrameValues(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "events")
      .withColumn("last_value_full", last($"value").over(full))
      .withColumn("third_value", nth_value($"value", 3).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"user_id", $"event_id", $"value", $"last_value_full", $"third_value")
      .orderBy($"user_id", $"event_id")
  }

  val q78FrameValuesSql: String =
    """SELECT user_id, event_id, value,
      |  LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value_full,
      |  NTH_VALUE(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** CDC latest-by-key compaction (SURVEY §2B "Dedup"): last event per key
    * by (event-time, unique id) — the reference's keyed latest-wins
    * semantics for change streams. At scale: one shuffle on the key, then
    * a per-partition top-1, no global sort.
    */
  def q15LatestByKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    latestByKey(Tables.load(s, dir, "events"),
        keys = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  /** Reusable CDC compaction: latest row per `keys` ordered by `orderCols`
    * descending (ties broken by the last, unique, order column).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  val q15LatestByKeySql: String =
    """SELECT user_id, event_id, event_type, value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Gap-based sessionization (30-min inactivity) via lag + cumulative
    * session counter — the batch-mode equivalent of
    * `session_window` (see graft.streaming for the streaming form).
    */
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_us".isNull || $"ts_us" - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           (max($"ts_us") - min($"ts_us")).as("duration_us"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
           sum($"n_events").as("n_events"),
           max($"duration_us").as("max_session_us"))
      .orderBy($"user_id")
  }

  val q16SessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |    CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts_us,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked),
      |per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |    MAX(ts_us) - MIN(ts_us) AS duration_us
      |  FROM sessions GROUP BY user_id, session_id)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  MAX(duration_us) AS max_session_us
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Interval (RANGE) window frame — the frame class the ROWS-framed
    * windows above don't cover: per-supplier trailing-30-day shipped
    * quantity. A RANGE frame includes ALL peer rows of the current ORDER
    * BY value, so the result is a pure function of (key, day) and cannot
    * depend on intra-day row order — exactly the frame a moving metric
    * over event time should use (a ROWS frame would make same-day ties
    * order-sensitive). Quantity sums stay exact-decimal until the final
    * double cast (Exact.scala conventions).
    */
  def q54RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey").orderBy($"d").rangeBetween(-30, 0)
    Tables.load(s, dir, "lineitem")
      .filter($"l_suppkey" <= 25)
      .withColumn("d",
        datediff(to_date($"l_shipdate"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("qty_30d", sum(d2($"l_quantity")).over(w).cast("double"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"d", $"qty_30d")
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  val q54RangeFrameSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, d,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
      |         OVER (PARTITION BY l_suppkey ORDER BY d
      |               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |       AS DOUBLE) AS qty_30d
      |FROM (SELECT *,
      |        CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS d
      |      FROM lineitem WHERE l_suppkey <= 25)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** q95 — running DISTINCT count over an ordered window: suppliers seen
    * so far within each order. Spark has no `COUNT(DISTINCT) OVER`, so
    * the idiom is `size(collect_set(...))` over a ROWS frame — the
    * registered form proves it equals the engine that has the builtin.
    * Determinism under ties: the order key includes the counted column
    * itself, so rows tying on (linenumber, suppkey) are same-supplier
    * duplicates whose running counts are equal in either order.
    */
  def q95WindowDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber", $"l_suppkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey",
        size(collect_set($"l_suppkey").over(w)).cast("long").as("suppliers_so_far"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_suppkey")
  }

  val q95WindowDistinctSql: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey,
      |  CAST(COUNT(DISTINCT l_suppkey)
      |         OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_suppkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |       AS BIGINT) AS suppliers_so_far
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_suppkey""".stripMargin

  /** q99 — burst debounce: collapse each BURST of same-(user, type)
    * events — consecutive events chained by sub-hold-off gaps — to its
    * first event: the noise filter telemetry/CDC pipelines apply to
    * button-mash and retry storms. Session semantics (the q16
    * gaps-and-islands construction): a burst ends only when a gap
    * reaches the hold-off, so a long drumbeat is ONE burst — the
    * behavior that collapses a retry storm to a single record. One
    * partitioned window stack, no joins; gap arithmetic is
    * whole-seconds (Spark's timestamp→long truncation ≡ DuckDB's
    * second-boundary date_diff).
    */
  def q99Debounce(s: SparkSession, dir: String, holdOffMin: Int = 5): DataFrame = {
    import s.implicits._
    val key = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .withColumn("gap_s",
        $"ts".cast("long") - lag($"ts", 1).over(key).cast("long"))
      .withColumn("starts_group",
        when($"gap_s".isNull || $"gap_s" >= holdOffMin * 60L, 1L).otherwise(0L))
      .withColumn("grp", sum($"starts_group")
        .over(key.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"event_type", $"grp").orderBy($"ts", $"event_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .orderBy($"user_id", $"event_type", $"ts", $"event_id")
  }

  def q99DebounceSql(holdOffMin: Int = 5): String =
    s"""WITH g AS (
      |  SELECT user_id, event_type, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) >= ${holdOffMin * 60}
      |         THEN 1 ELSE 0 END AS starts_group
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
      |grp AS (
      |  SELECT *, SUM(starts_group) OVER (PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM g),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, grp
      |    ORDER BY ts, event_id) AS rn
      |  FROM grp)
      |SELECT user_id, event_type, event_id, ts
      |FROM r WHERE rn = 1
      |ORDER BY user_id, event_type, ts, event_id""".stripMargin

  /** q96 — ratio-to-report: each line's share of its return-flag group's
    * total value, the percent-of-total idiom (`ratio_to_report` in other
    * engines) as a full-partition window. The denominator is the exact
    * decimal group sum cast to double once; no running frame, so tie
    * order is irrelevant.
    */
  def q96RatioToReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_returnflag")
    Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_extendedprice",
        ($"l_extendedprice" / sum(d2($"l_extendedprice")).over(w).cast("double"))
          .as("share_of_flag"))
      .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice")
  }

  val q96RatioToReportSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
      |  l_extendedprice / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY l_returnflag) AS DOUBLE) AS share_of_flag
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of join and the remaining aggregation surface (distinct aggregates,
  * ordered string/collect aggregation, approximate distinct).
  */
object AsofJoin {

  /** As-of join: for every event, the user's latest order with
    * `o_orderdate <= ts` — implemented as the scalable union-sort form:
    * tag both sides, union, ONE shuffle on the key, and a running
    * `last(..., ignoreNulls)` window carries the most recent order into
    * each event row. No range-join blowup: cost is sort + single pass;
    * at 100 TB this is the canonical time-series join shape (the naive
    * inequality join the oracle uses is O(events × orders-per-user)).
    *
    * Tie rules: an order at exactly the event timestamp counts (`<=`),
    * and among equal-date orders the largest o_orderkey wins — encoded by
    * the sort order (t, side, o_orderkey) with orders(0) before events(1).
    */
  def q17Asof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
      .select($"o_custkey".as("k"), $"o_orderdate".as("t"),
        lit(0).as("side"), $"o_orderkey",
        lit(null).cast("long").as("event_id"))
    val events = Tables.load(s, dir, "events")
      .select($"user_id".as("k"), $"ts".as("t"),
        lit(1).as("side"), lit(null).cast("long").as("o_orderkey"),
        $"event_id")
    val w = Window.partitionBy($"k")
      .orderBy($"t", $"side", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionAll(events)
      .withColumn("asof_orderkey", last($"o_orderkey", ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", last(when($"side" === 0, $"t"), ignoreNulls = true).over(w))
      .filter($"side" === 1 && $"asof_orderkey".isNotNull)
      .select($"event_id", $"k".as("user_id"), $"asof_orderkey", $"asof_orderdate")
      .orderBy($"event_id")
  }

  val q17AsofSql: String =
    """SELECT event_id, user_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
      |FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |        ROW_NUMBER() OVER (PARTITION BY e.event_id
      |                           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |      FROM events e JOIN orders o
      |        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** q188: the SAME as-of semantics as q17, executed by the native
    * whole-operator plan node (`plans/NativeAsof`: logical plan +
    * planner strategy + physical sort-merge as-of exec) instead of the
    * union-window composition — and graded by the IDENTICAL oracle, so
    * the gate proves the custom operator end-to-end: distribution/
    * ordering contracts, the per-partition merge, tie resolution
    * (equal-date orders → largest o_orderkey, via the tie-break
    * ordering), and null-side handling.
    */
  def q188AsofNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderdate", $"o_orderkey")
    val events = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id")
    graft.plans.NativeAsof.asofJoin(
        events, orders,
        leftKey = $"user_id", rightKey = $"o_custkey",
        leftTime = $"ts", rightTime = $"o_orderdate",
        rightTieBreak = Seq($"o_orderkey"))
      .filter($"o_orderkey".isNotNull)
      .select($"event_id", $"user_id",
        $"o_orderkey".as("asof_orderkey"),
        $"o_orderdate".as("asof_orderdate"))
      .orderBy($"event_id")
  }

  /** q189: FORWARD as-of — each event's next order at-or-after its
    * timestamp ("what did the user buy next?"). Exercises operator
    * REUSE: forward(t) = backward(−t), so the same native plan node
    * runs on negated µs time columns — no second operator, no second
    * code path; the tie rule flips to smallest o_orderkey (negated key
    * tie-break ascending). The oracle is the naive inequality join with
    * ASC ordering.
    */
  def q189AsofForward(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderdate", $"o_orderkey",
        (-unix_micros($"o_orderdate".cast("timestamp"))).as("neg_t"))
    val events = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id",
        (-unix_micros($"ts")).as("neg_ts"),
        (-$"event_id").as("neg_eid"))
    graft.plans.NativeAsof.asofJoin(
        orders, events,
        leftKey = $"o_custkey", rightKey = $"user_id",
        leftTime = $"neg_t", rightTime = $"neg_ts",
        rightTieBreak = Seq($"neg_eid"))
      .filter($"event_id".isNotNull)
      .select($"o_orderkey", $"o_custkey",
        $"event_id".as("next_event_id"), $"ts".as("next_event_ts"))
      .orderBy($"o_orderkey")
  }

  val q189AsofForwardSql: String =
    """SELECT o_orderkey, o_custkey, event_id AS next_event_id,
      |  ts AS next_event_ts
      |FROM (SELECT o.o_orderkey, o.o_custkey, e.event_id, e.ts,
      |        ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
      |                           ORDER BY e.ts ASC, e.event_id ASC) AS rn
      |      FROM orders o JOIN events e
      |        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
      |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin

  /** Range join: per (user, day-of-activity) pairings — events joined to
    * orders of the same user within ±N days of the event. The small side
    * is broadcast so the inequality condition evaluates as a broadcast
    * nested-loop per user-partition rather than a cartesian shuffle; at
    * larger scales, bucketize the time axis (join on (user, day_bucket)
    * equi-keys with ±1 bucket expansion) to regain a hash join — that
    * form is what q17's union-sort does for the as-of special case.
    */
  def q44RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .filter($"user_id" <= 30)
      .select($"user_id", $"event_id", $"ts")
    val o = Tables.load(s, dir, "orders")
      .filter($"o_custkey" <= 30 &&
        $"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    e.join(broadcast(o),
        $"user_id" === $"o_custkey" &&
          datediff($"ts", $"o_orderdate").between(9650, 9700))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"), countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"user_id")
  }

  val q44RangeJoinSql: String =
    """SELECT user_id, COUNT(*) AS n_pairs, COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM events e JOIN orders o
      |  ON e.user_id = o.o_custkey
      | AND datediff('day', CAST(o.o_orderdate AS DATE), CAST(e.ts AS DATE)) BETWEEN 9650 AND 9700
      |WHERE user_id <= 30
      |  AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Distinct aggregates alongside plain ones (Spark plans the expand +
    * two-phase agg automatically).
    */
  def q14DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  val q14DistinctAggSql: String =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT o_orderpriority) AS n_prio,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Ordered collect: per nation, its market segments as a sorted joined
    * string (collect_list made deterministic via sort_array; arrays are
    * rendered to strings because engines disagree on array dtype
    * round-trips, not on the values).
    */
  def q22Collect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(
        array_join(sort_array(collect_set($"c_mktsegment")), ",").as("segments"),
        count(lit(1)).as("n"))
      .orderBy($"c_nationkey")
  }

  val q22CollectSql: String =
    """SELECT c_nationkey,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import Exact._

/** Relational operator surface (SURVEY §2B) as thin, oracle-checked wrappers
  * over Spark built-ins: scan, filter/project, hash aggregation, equi-joins
  * of every flavor (broadcast and shuffled), semi/anti joins, multiway
  * star-schema joins, set operations, distinct, rollup/cube, top-k, and
  * exact-decimal statistics.
  *
  * Scale notes (100 TB): every query here is fully declarative — Catalyst
  * pushes filters/projections into the parquet scan, aggregations run
  * partial (map-side) then final, and dimension tables are broadcast so the
  * only shuffles left are the unavoidable key exchanges on the fact table.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: partial (map-side) aggregation is
    * automatic; at 100 TB the only shuffle is the 4-group exchange.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qty  = d2($"l_quantity")
    val ep   = d2($"l_extendedprice")
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * oneMinus($"l_discount")).cast("double").as("sum_disc_price"),
        sum(ep * oneMinus($"l_discount") * onePlus($"l_tax")).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      | ${sqlDsum("l_quantity")} AS sum_qty,
      | ${sqlDsum("l_extendedprice")} AS sum_base_price,
      | CAST(SUM(${sqlD2("l_extendedprice")} * ${sqlOneMinus("l_discount")}) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(${sqlD2("l_extendedprice")} * ${sqlOneMinus("l_discount")} * ${sqlOnePlus("l_tax")}) AS DOUBLE) AS sum_charge,
      | ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Broadcast equi-join: fact (lineitem) × small dim (part). `broadcast()`
    * keeps the 100 TB side shuffle-free — the dim ships to every executor.
    */
  def q2JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val p  = Tables.load(s, dir, "part").select($"p_partkey", $"p_brand")
    li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        sum(d2($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }

  val q2JoinBroadcastSql: String =
    s"""SELECT p_brand,
      | CAST(SUM(${sqlD2("l_extendedprice")} * ${sqlOneMinus("l_discount")}) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q3-shaped 3-way join + top-10: the two fact tables shuffle on
    * the join key; customer is broadcast. LIMIT after a total order
    * (revenue DESC, key ASC) keeps the answer deterministic.
    */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val c = Tables.load(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" > cutoff)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(d2($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3TopOrdersSql: String =
    s"""SELECT l_orderkey, o_orderdate,
      | CAST(SUM(${sqlD2("l_extendedprice")} * ${sqlOneMinus("l_discount")}) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Left-semi join (EXISTS): orders that have at least one big-quantity
    * line item — the probe side never materializes lineitem columns.
    */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o  = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
      .filter($"l_quantity" >= 48.0).select($"l_orderkey")
    o.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val q4SemiJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_nationkey")
  }

  val q5AntiJoinSql: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q6-shaped scan: filter + project + single global aggregate.
    * All three predicates and the 2-column projection push into the
    * parquet scan (PushedFilters + ReadSchema in .explain).
    */
  def q6FilterAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"l_shipdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
      .agg(
        sum(d2($"l_extendedprice") * $"l_discount".cast(DecimalType(4, 2))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q6FilterAggSql: String =
    s"""SELECT
      | CAST(SUM(${sqlD2("l_extendedprice")} * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin

  /** TPC-H Q5-shaped 6-way star join: region→nation→(customer, supplier)
    * →orders→lineitem with the c_nationkey = s_nationkey colocation
    * condition. All dims broadcast; the two fact tables shuffle once on
    * orderkey. This is the headline multiway-join benchmark query.
    */
  def q5Multiway(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r  = Tables.load(s, dir, "region").filter($"r_name" === "ASIA")
    val n  = Tables.load(s, dir, "nation")
    val c  = Tables.load(s, dir, "customer")
    val su = Tables.load(s, dir, "supplier")
    val o  = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"o_orderdate" <  lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val li = Tables.load(s, dir, "lineitem")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(su), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(d2($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5MultiwaySql: String =
    s"""SELECT n_name,
      | CAST(SUM(${sqlD2("l_extendedprice")} * ${sqlOneMinus("l_discount")}) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Set operations: INTERSECT / EXCEPT over the same keyed projections,
    * tagged and unioned into one deterministic result. Spark plans these
    * as hash semi/anti joins — same shuffle shape as q4/q5.
    */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val p = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    val both  = f.intersect(p).withColumn("tag", lit("both"))
    val fOnly = f.except(p).withColumn("tag", lit("f_only"))
    both.union(fOnly)
      .select($"tag", $"o_custkey")
      .orderBy($"tag", $"o_custkey")
  }

  val q10SetOpsSql: String =
    """SELECT 'both' AS tag, o_custkey
      |FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |      INTERSECT
      |      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |UNION ALL
      |SELECT 'f_only' AS tag, o_custkey
      |FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |      EXCEPT
      |      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |ORDER BY tag, o_custkey""".stripMargin

  /** Exact distinct (dedup of a projection). */
  def q11Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  val q11DistinctSql: String =
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** ROLLUP grouping sets: (flag,status), (flag), (). One shuffle; Spark
    * expands grouping sets map-side.
    */
  def q12Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val q12RollupSql: String =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CUBE grouping sets over orders. */
  def q18Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q18CubeSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS — ((status), (priority)): two independent
    * one-column groupings in a single pass/shuffle, a shape neither
    * rollup nor cube produces.
    */
  def q24GroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q24GroupingSetsSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Global top-k: total order (price DESC, key ASC) + limit. Spark plans
    * TakeOrderedAndProject — per-partition heap + single k-row merge, no
    * global sort even at 100 TB.
    */
  def q13TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  val q13TopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Exact-decimal statistics: n/sum/mean/stddev per group, where stddev is
    * derived from exact decimal sum and sum-of-squares via an identical
    * double expression on both engines — no reliance on engine-internal
    * streaming-variance algorithms.
    */
  def q19Stats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x  = d2($"o_totalprice")
    Tables.load(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_price"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"),
        (sum(x).cast("double") / count(lit(1))).as("mean_price"),
        // float presentation: Σx² is a WIDE decimal and wide-decimal →
        // double casts diverge in the last ulp across engines (the
        // q165/q205 rule) — surfaced at sf0.1 by the round-16 full
        // two-scale sweep, invisible at the sf0.01 gate
        sqrt((sum(x * x).cast("double") - sum(x).cast("double") * sum(x).cast("double") / count(lit(1)))
          / (count(lit(1)) - lit(1))).cast("float").as("stddev_price"))
      .orderBy($"o_orderstatus")
  }

  val q19StatsSql: String =
    s"""SELECT o_orderstatus,
      | COUNT(*) AS n,
      | ${sqlDsum("o_totalprice")} AS sum_price,
      | MIN(o_totalprice) AS min_price,
      | MAX(o_totalprice) AS max_price,
      | ${sqlDsum("o_totalprice")} / COUNT(*) AS mean_price,
      | CAST(SQRT((CAST(SUM(${sqlD2("o_totalprice")} * ${sqlD2("o_totalprice")}) AS DOUBLE)
      |       - ${sqlDsum("o_totalprice")} * ${sqlDsum("o_totalprice")} / COUNT(*))
      |      / (COUNT(*) - 1)) AS FLOAT) AS stddev_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q85 — bivariate statistics (covariance, Pearson correlation, OLS
    * slope) per group, the `DataFrame.stat`-surface capability in the
    * engine-portable exact form: all six sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy) are EXACT decimal aggregates
    * (associative ⇒ partition-order independent), and each output is one
    * fixed-shape double expression over them — the q19/q53 convention
    * extended to second-order cross moments. Built-in `corr`/`covar_pop`
    * accumulate doubles in partition order and can't be oracle-gated;
    * this form can, and is the same single-shuffle plan.
    */
  def q85Corr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qd = d2($"l_quantity"); val pd = d2($"l_extendedprice")
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(qd).as("sq"), sum(pd).as("sp"),
        sum(qd * qd).as("sqq"), sum(pd * pd).as("spp"), sum(qd * pd).as("sqp"))
      .select($"l_returnflag", $"n",
        (($"sqp".cast("double") - $"sq".cast("double") * $"sp".cast("double") / $"n") / $"n")
          .as("cov_qp"),
        (($"sqp".cast("double") - $"sq".cast("double") * $"sp".cast("double") / $"n") /
          (sqrt($"sqq".cast("double") - $"sq".cast("double") * $"sq".cast("double") / $"n") *
            sqrt($"spp".cast("double") - $"sp".cast("double") * $"sp".cast("double") / $"n")))
          .as("corr_qp"),
        (($"sqp".cast("double") - $"sq".cast("double") * $"sp".cast("double") / $"n") /
          ($"sqq".cast("double") - $"sq".cast("double") * $"sq".cast("double") / $"n"))
          .as("beta_qp"))
      .orderBy($"l_returnflag")
  }

  val q85CorrSql: String = {
    val (sq, sp)  = ("CAST(SUM(qd) AS DOUBLE)", "CAST(SUM(pd) AS DOUBLE)")
    val (sqq, spp, sqp) = ("CAST(SUM(qd*qd) AS DOUBLE)", "CAST(SUM(pd*pd) AS DOUBLE)",
      "CAST(SUM(qd*pd) AS DOUBLE)")
    s"""SELECT l_returnflag, COUNT(*) AS n,
      |  ($sqp - $sq * $sp / COUNT(*)) / COUNT(*) AS cov_qp,
      |  ($sqp - $sq * $sp / COUNT(*)) /
      |    (SQRT($sqq - $sq * $sq / COUNT(*)) * SQRT($spp - $sp * $sp / COUNT(*))) AS corr_qp,
      |  ($sqp - $sq * $sp / COUNT(*)) / ($sqq - $sq * $sq / COUNT(*)) AS beta_qp
      |FROM (SELECT l_returnflag, ${sqlD2("l_quantity")} AS qd,
      |        ${sqlD2("l_extendedprice")} AS pd FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** q93 — equi-width histogram: the distribution profile every data
    * audit starts with, as pure binning arithmetic (floor of the scaled
    * value, overflow clipped into the last bucket) so both engines
    * compute the same IEEE op — DuckDB has no `width_bucket`, and
    * binning arithmetic is what `width_bucket` compiles to anyway.
    * Exact decimal sums per bucket (the q19 convention); one shuffle on
    * ≤ 12 keys.
    */
  def q93Histogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy(least(floor($"o_totalprice" / 50000).cast("long"), lit(11L)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum($"o_totalprice").as("sum_price"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
      .orderBy($"bucket")
  }

  val q93HistogramSql: String =
    s"""SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 11) AS bucket,
      |  COUNT(*) AS n,
      |  ${sqlDsum("o_totalprice")} AS sum_price,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q185: hierarchical share-of-parent — revenue by nation with each
    * nation's share of its region and each region's share of the
    * corporate total: the drill-down ratio tree every OLAP cube renders.
    * ONE fact-side aggregation (orders joined through the broadcast
    * customer→nation→region dimension spine) produces the nation frame;
    * region and grand totals reduce the BOUNDED nation frame, broadcast
    * back. Revenue is the q1 exact-decimal convention; each share is a
    * single double division.
    */
  def q185ShareOfParent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val n = Tables.load(s, dir, "nation")
      .select($"n_nationkey", $"n_name", $"n_regionkey")
    val r = Tables.load(s, dir, "region").select($"r_regionkey", $"r_name")
    val dim = c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"n_name".as("nation"), $"r_name".as("region"))
    // decimal end-to-end: region/total reductions stay associative-exact,
    // ONE cast to double per output column at presentation
    val byNation = Tables.load(s, dir, "orders")
      .join(broadcast(dim), $"o_custkey" === $"c_custkey")
      .groupBy($"region", $"nation")
      .agg(sum(d2($"o_totalprice")).as("revd"))
    val byRegion = byNation.groupBy($"region").agg(sum($"revd").as("region_revd"))
    val total = byNation.agg(sum($"revd").as("total_revd"))
    byNation.join(broadcast(byRegion), "region")
      .crossJoin(broadcast(total))
      .select($"region", $"nation",
        $"revd".cast("double").as("rev"),
        $"region_revd".cast("double").as("region_rev"),
        $"total_revd".cast("double").as("total_rev"),
        ($"revd".cast("double") / $"region_revd".cast("double"))
          .as("share_of_region"),
        ($"region_revd".cast("double") / $"total_revd".cast("double"))
          .as("region_share_of_total"))
      .orderBy($"region", $"nation")
  }

  val q185ShareOfParentSql: String =
    s"""WITH nat AS (
      |  SELECT r_name AS region, n_name AS nation,
      |    SUM(${sqlD2("o_totalprice")}) AS revd
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |reg AS (SELECT region, SUM(revd) AS region_revd FROM nat GROUP BY 1),
      |tot AS (SELECT SUM(revd) AS total_revd FROM nat)
      |SELECT region, nation, CAST(revd AS DOUBLE) AS rev,
      |  CAST(region_revd AS DOUBLE) AS region_rev,
      |  CAST(total_revd AS DOUBLE) AS total_rev,
      |  CAST(revd AS DOUBLE) / CAST(region_revd AS DOUBLE)
      |    AS share_of_region,
      |  CAST(region_revd AS DOUBLE) / CAST(total_revd AS DOUBLE)
      |    AS region_share_of_total
      |FROM nat JOIN reg USING (region) CROSS JOIN tot
      |ORDER BY region, nation""".stripMargin

  /** q84 — the z-order clustering key (`functions/ZOrder`,
    * `sources/Layout`) under the oracle: Morton codes over
    * (customer key, days-since-epoch of the order date), the two
    * dimensions an orders table is queried by. The oracle reproduces
    * the mask-spread bit-twiddling chain in SQL bit arithmetic, so the
    * gate proves the interleaving bit-for-bit; LayoutSpec separately
    * proves that SORTING by this key actually buys file-level locality.
    */
  def q84ZOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"o_custkey".cast("long")
    val y = datediff($"o_orderdate", lit(java.sql.Date.valueOf("1992-01-01"))).cast("long")
    Tables.load(s, dir, "orders")
      .select($"o_orderkey",
        x.bitwiseAND(lit(65535L)).as("x16"),
        y.bitwiseAND(lit(65535L)).as("y16"),
        graft.functions.ZOrder.zValue(x, y).as("zval"))
      .orderBy($"o_orderkey")
  }

  val q84ZOrderSql: String =
    """WITH t AS (
      |  SELECT o_orderkey,
      |    CAST(o_custkey AS BIGINT) & 65535 AS xa,
      |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) & 65535 AS ya
      |  FROM orders),
      |s1 AS (SELECT o_orderkey, xa, ya,
      |  ((xa | (xa << 8)) & 16711935) AS xb, ((ya | (ya << 8)) & 16711935) AS yb FROM t),
      |s2 AS (SELECT *, ((xb | (xb << 4)) & 252645135) AS xc,
      |  ((yb | (yb << 4)) & 252645135) AS yc FROM s1),
      |s3 AS (SELECT *, ((xc | (xc << 2)) & 858993459) AS xd,
      |  ((yc | (yc << 2)) & 858993459) AS yd FROM s2),
      |s4 AS (SELECT *, ((xd | (xd << 1)) & 1431655765) AS xe,
      |  ((yd | (yd << 1)) & 1431655765) AS ye FROM s3)
      |SELECT o_orderkey, xa AS x16, ya AS y16, (xe | (ye << 1)) AS zval
      |FROM s4 ORDER BY o_orderkey""".stripMargin

  /** q155: NEST / document assembly — the inverse of explode, and the
    * export shape every document store and feature platform asks a
    * relational engine for: each order reassembled WITH its line items
    * as one ordered nested collection, plus the parent attributes, in
    * one pass. In Spark the nested collection is
    * `sort_array(collect_list(struct))`; for oracle comparability the
    * sorted items serialize to a canonical string (the q22 convention —
    * DuckDB's `string_agg(... ORDER BY)` states the same thing). Scale
    * shape: ONE map-side item render, ONE orderkey shuffle for the
    * collect, ONE key-equijoin back to the parent — no window, no
    * second pass; item arrays are bounded by order size, not corpus
    * size.
    */
  def q155Nest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey",
        concat_ws(":", $"l_linenumber", $"l_partkey",
          $"l_quantity".cast("long")).as("item"),
        $"l_quantity")
      .groupBy($"l_orderkey")
      .agg(array_join(sort_array(collect_list($"item")), "|").as("items"),
        count(lit(1)).as("n_items"),
        sum($"l_quantity".cast("long")).as("total_qty"))
    Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
      .join(items, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        $"n_items", $"total_qty", $"items")
      .orderBy($"o_orderkey")
  }

  /** q158: grouped exact MODE — the most frequent value per group with
    * a deterministic tie-break (highest count, then lexicographically
    * smallest value): the one classic aggregate the surface had not
    * yet named. The rank-filter form compiles to WindowGroupLimit, so
    * each map task pre-prunes to its own best candidate per group
    * BEFORE the exchange (the q125 lesson) — the shuffle carries
    * O(groups × values-per-task), never the fact table.
    */
  def q158Mode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.load(s, dir, "customer")
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_nationkey").orderBy($"n".desc, $"c_mktsegment")
    counts
      .withColumn("rnk", row_number().over(best))
      .filter($"rnk" === 1)
      .select($"c_nationkey", $"c_mktsegment".as("mode_segment"),
        $"n".as("mode_n"))
      .orderBy($"c_nationkey")
  }

  val q158ModeSql: String =
    """SELECT c_nationkey, c_mktsegment AS mode_segment, n AS mode_n
      |FROM (
      |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY COUNT(*) DESC, c_mktsegment) AS rnk
      |  FROM customer GROUP BY 1, 2)
      |WHERE rnk = 1 ORDER BY c_nationkey""".stripMargin

  val q155NestSql: String =
    """WITH items AS (
      |  SELECT l_orderkey,
      |    string_agg(CAST(l_linenumber AS VARCHAR) || ':' ||
      |      CAST(l_partkey AS VARCHAR) || ':' ||
      |      CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), '|'
      |      ORDER BY CAST(l_linenumber AS VARCHAR) || ':' ||
      |        CAST(l_partkey AS VARCHAR) || ':' ||
      |        CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)) AS items,
      |    CAST(COUNT(*) AS BIGINT) AS n_items,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT o_orderkey, o_custkey, o_orderpriority, n_items, total_qty, items
      |FROM orders JOIN items ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin
}

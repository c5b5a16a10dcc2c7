package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** SQL-front-door coverage of the relational corners a DataFrame-first
  * suite can under-exercise: outer joins with genuinely-null sides,
  * correlated scalar subqueries (Catalyst decorrelates them into an
  * aggregate + join — the plan a user gets when they write the natural
  * SQL), LATERAL subqueries (per-row top-k without a window over the
  * whole table), and recursive CTEs (Spark 4's UnionLoop). Each query
  * is the SAME SQL text a reference user would port, run through
  * `spark.sql` over the temp-view catalog (`Tables.createViews`), and
  * each oracle is near-identical SQL — the point is engine-semantics
  * parity, not translation.
  */
object SqlSurface {

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.createViews(s, dir)
    s.sql(q)
  }

  /** q87 — LEFT OUTER join with a genuinely-null right side: customers
    * that placed no orders survive with n_orders = 0 (TPC-H populates
    * only 2/3 of customers into orders). One shuffle on the join key;
    * the aggregate is pushed below the join (grouped before joining) so
    * the outer join sees one row per customer on each side.
    */
  private val q87 =
    """SELECT c.c_custkey,
      |  CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
      |  (o.n_orders IS NOT NULL) AS has_orders
      |FROM customer c
      |LEFT OUTER JOIN (
      |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
      |) o ON c.c_custkey = o.o_custkey
      |ORDER BY c.c_custkey""".stripMargin

  def q87LeftOuter(s: SparkSession, dir: String): DataFrame = sql(s, dir, q87)
  val q87LeftOuterSql: String = q87

  /** q88 — FULL OUTER join where BOTH null sides occur: per-part
    * returned ('R') vs accepted ('A') quantities; many parts appear on
    * only one side, so each branch of the null-filling coalesce is
    * exercised. Quantities are exact decimal sums rendered as double
    * (the Exact convention).
    */
  private val q88 =
    """SELECT coalesce(r.l_partkey, a.l_partkey) AS partkey,
      |  CAST(coalesce(r.qty_r, 0) AS DOUBLE) AS qty_returned,
      |  CAST(coalesce(a.qty_a, 0) AS DOUBLE) AS qty_accepted,
      |  (r.l_partkey IS NOT NULL AND a.l_partkey IS NOT NULL) AS both_sides
      |FROM
      |  (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_r
      |   FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey) r
      |FULL OUTER JOIN
      |  (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_a
      |   FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey) a
      |ON r.l_partkey = a.l_partkey
      |ORDER BY partkey""".stripMargin

  def q88FullOuter(s: SparkSession, dir: String): DataFrame = sql(s, dir, q88)
  val q88FullOuterSql: String = q88

  /** q89 — correlated scalar subquery: orders strictly above their own
    * customer's average order value. Catalyst decorrelates the subquery
    * into a grouped aggregate joined back on the correlation key — the
    * single-shuffle plan one would write by hand — so the registered
    * form proves the decorrelation path, not just the join. The
    * threshold is an exact decimal sum over count (portable), compared,
    * never output.
    */
  private val q89 =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  def q89ScalarSubquery(s: SparkSession, dir: String): DataFrame = sql(s, dir, q89)
  val q89ScalarSubquerySql: String = q89

  /** q90 — LATERAL subquery: the top-2 nations by customer count WITHIN
    * each region, written as a per-row dependent subquery instead of a
    * global window. Spark plans the decorrelated aggregate + per-group
    * limit; the idiom ports 1:1 to DuckDB's LATERAL.
    */
  private val q90 =
    """SELECT r.r_name, t.n_name, t.n_cust
      |FROM region r,
      |LATERAL (
      |  SELECT n.n_name, COUNT(*) AS n_cust
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_cust DESC, n_name
      |  LIMIT 2) t
      |ORDER BY r.r_name, t.n_cust DESC, t.n_name""".stripMargin

  def q90Lateral(s: SparkSession, dir: String): DataFrame = sql(s, dir, q90)
  val q90LateralSql: String = q90

  /** q91 — recursive CTE (Spark 4 UnionLoop): generate the full month
    * axis of the order-date domain recursively, then LEFT JOIN monthly
    * order counts so empty months appear with n = 0 — the gaps-included
    * time series a dashboard needs, without a generator function.
    */
  private val q91 =
    """WITH RECURSIVE months(m) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT m + 1 FROM months WHERE m < 83
      |)
      |SELECT m.m AS month_idx,
      |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
      |FROM months m
      |LEFT OUTER JOIN (
      |  SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mi,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1
      |) o ON o.mi = m.m
      |ORDER BY month_idx""".stripMargin

  def q91RecursiveCte(s: SparkSession, dir: String): DataFrame = sql(s, dir, q91)
  val q91RecursiveCteSql: String = q91
}

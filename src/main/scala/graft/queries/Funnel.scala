package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ordered-event analytics over the events stream: funnel progression
  * (the ordered-pattern query sessionization can't express) and cohort
  * retention — the two queries every product-analytics consumer of a
  * CDC event feed runs.
  *
  * Scale shape: every step is an aggregation or join keyed on user_id,
  * so one hash-partitioning is reused across the whole plan (no
  * re-shuffle between steps), and the per-step frames are
  * one-row-per-user — orders of magnitude smaller than the event table
  * they summarize.
  */
object Funnel {

  /** view → click → purchase funnel by min-time chaining: the first
    * qualifying event of each stage must come strictly after the
    * previous stage's. Emits per-user stage times and the stage reached
    * (0-3). Exact and deterministic — min() chaining has none of the
    * ambiguity of regex-style sequence matching.
    */
  def q48Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events").select($"user_id", $"event_type", $"ts")
    val users = e.select($"user_id").distinct()
    val t1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val t2 = e.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val t3 = e.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    users
      .join(t1, Seq("user_id"), "left")
      .join(t2.select($"user_id", $"t_click"), Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select($"user_id", $"t_view", $"t_click", $"t_purchase",
        (when($"t_purchase".isNotNull, 3)
          .when($"t_click".isNotNull, 2)
          .when($"t_view".isNotNull, 1)
          .otherwise(0)).cast("long").as("stage"))
      .orderBy($"user_id")
  }

  val q48FunnelSql: String =
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click
      |  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t_view
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_purchase
      |  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t_click
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT u.user_id, t1.t_view, t2.t_click, t3.t_purchase,
      |  CAST(CASE WHEN t3.t_purchase IS NOT NULL THEN 3
      |            WHEN t2.t_click IS NOT NULL THEN 2
      |            WHEN t1.t_view IS NOT NULL THEN 1
      |            ELSE 0 END AS BIGINT) AS stage
      |FROM (SELECT DISTINCT user_id FROM events) u
      |LEFT JOIN t1 ON u.user_id = t1.user_id
      |LEFT JOIN t2 ON u.user_id = t2.user_id
      |LEFT JOIN t3 ON u.user_id = t3.user_id
      |ORDER BY u.user_id""".stripMargin

  /** Day-grain cohort retention: cohort = each user's first-activity
    * day; one row per (cohort_day, day_offset) with the count of
    * cohort users active that many days later. The (user, day) distinct
    * collapse happens BEFORE the cohort join, so the join input is
    * users×days, not raw events.
    */
  def q49Retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val cohort = e.groupBy($"user_id").agg(min($"d").as("cohort_day"))
    e.join(cohort, "user_id")
      .groupBy($"cohort_day", datediff($"d", $"cohort_day").cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val q49RetentionSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |cohort AS (SELECT user_id, MIN(d) AS cohort_day FROM ud GROUP BY user_id)
      |SELECT c.cohort_day,
      |  CAST(date_diff('day', c.cohort_day, ud.d) AS BIGINT) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM ud JOIN cohort c ON ud.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-user event-rate anomaly detection: hours where a user's event
    * count exceeds their own mean + 2σ across active hours. The
    * monitoring query an operator runs against a CDC event feed.
    *
    * Oracle-exactness by construction: per-hour counts, their sum, and
    * their sum-of-squares are exact integers (no double accumulation to
    * be partition-order dependent), so mean/variance come from ONE
    * double expression over exact inputs — bit-identical in any engine
    * evaluating the same formula, unlike stddev() whose streaming
    * accumulation differs across engines and partitionings.
    */
  def q53Anomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.load(s, dir, "events")
      .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy($"user_id")
      .agg(sum($"n").as("s"), sum($"n" * $"n").as("ss"), count(lit(1)).as("k"))
      .filter($"k" >= 2)
      .select($"user_id",
        ($"s".cast("double") / $"k").as("mean_n"),
        sqrt(($"ss" - $"s".cast("double") * $"s" / $"k") / ($"k" - 1)).as("sd_n"))
    hourly.join(stats, "user_id")
      .filter($"n" > $"mean_n" + lit(2.0) * $"sd_n")
      .select($"user_id", $"h", $"n", $"mean_n", $"sd_n")
      .orderBy($"user_id", $"h")
  }

  val q53AnomalySql: String =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT user_id,
      |    CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n,
      |    sqrt((SUM(n*n) - CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*)) / (COUNT(*) - 1)) AS sd_n
      |  FROM hourly GROUP BY user_id HAVING COUNT(*) >= 2)
      |SELECT hourly.user_id, h, n, mean_n, sd_n
      |FROM hourly JOIN stats ON hourly.user_id = stats.user_id
      |WHERE n > mean_n + 2.0 * sd_n
      |ORDER BY hourly.user_id, h""".stripMargin

  /** q139: conversion-latency report — the "how long from first view
    * to purchase" one-liner next to q48's stage chaining: per user the
    * first view, the first purchase AT OR AFTER it (latency 0 allowed,
    * unlike q48's strict chain — a same-instant purchase still
    * converted), then one global row with the conversion rate and the
    * exact interpolated p50/p90 of the latency distribution. All
    * arithmetic is exact µs integers until the two percentiles, which
    * round to 2 dp so a sub-ULP interpolation-formula difference
    * cannot leak (µs magnitudes ~1e9, double ulp ~1e-7 — absorbed).
    * Both per-user aggregates and the join key on user_id; the final
    * aggregate is one row.
    */
  def q139FunnelLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val viewed = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("tv"))
    val lat = e.filter($"event_type" === "purchase")
      .join(viewed, "user_id").filter($"us" >= $"tv")
      .groupBy($"user_id").agg(min($"us").as("tp"), min($"tv").as("tv"))
      .select(($"tp" - $"tv").as("lat_us"))
    val nv = viewed.agg(count(lit(1)).as("n_viewed"))
    lat.crossJoin(broadcast(nv))
      .groupBy($"n_viewed")
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(lat_us, 0.5)").as("p50"),
        expr("percentile(lat_us, 0.9)").as("p90"))
      .select($"n_viewed", $"n_converted",
        ($"n_converted".cast("double") / $"n_viewed").as("conv_rate"),
        round($"p50", 2).as("p50_latency_us"),
        round($"p90", 2).as("p90_latency_us"))
  }

  val q139FunnelLatencySql: String =
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS tv
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS tp, min(v.tv) AS tv
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.tv
      |  GROUP BY 1),
      |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_viewed FROM v)
      |SELECT nv.n_viewed, CAST(COUNT(*) AS BIGINT) AS n_converted,
      |  CAST(COUNT(*) AS DOUBLE) / nv.n_viewed AS conv_rate,
      |  round(quantile_cont(tp - tv, 0.5), 2) AS p50_latency_us,
      |  round(quantile_cont(tp - tv, 0.9), 2) AS p90_latency_us
      |FROM c CROSS JOIN nv GROUP BY nv.n_viewed""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral analytics over the event stream — the product-analytics
  * pair every warehouse ships: cohort retention matrices and marketing
  * attribution. Both are plain declarative plans (grouped aggregates and
  * per-user windows); the point of registering them is pinning the
  * cross-engine arithmetic corners (week truncation, day-diff division,
  * IGNORE NULLS frame semantics) that silently corrupt real dashboards.
  */
object Behavior {

  /** q109: weekly cohort retention. Cohort = the Monday-truncated week
    * of a user's first event; each (user, active week) pair counts once
    * toward (cohort_week, week_offset). Two grouped aggregates and one
    * user-keyed join — at scale both shuffles key on user_id and the
    * join is co-partitioned with the first aggregate's output (no extra
    * exchange), so the cost is ~one pass over events.
    *
    * Arithmetic corners pinned by the oracle: `date_trunc('week')` is
    * Monday-start in both engines; week offsets divide an exact
    * multiple-of-7 day count (integral `/` is double division in BOTH
    * engines — cast back to BIGINT on both sides, the q94 discipline).
    */
  def q109CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val uw = Tables.load(s, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
      .distinct()
    val cohort = uw.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy($"cohort_week",
        (datediff($"wk", $"cohort_week") / 7).cast("long").as("week_offset"))
      .agg(count_distinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val q109CohortRetentionSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY user_id)
      |SELECT cohort.cohort_week,
      |  CAST(date_diff('day', cohort.cohort_week, uw.wk) / 7 AS BIGINT) AS week_offset,
      |  CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
      |FROM uw JOIN cohort ON cohort.user_id = uw.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q110: touch attribution for purchases. For every purchase event,
    * last-touch = the most recent strictly-preceding click by the same
    * user; first-touch = the user's earliest preceding click-or-view.
    * One per-user window with a `ROWS ... AND 1 PRECEDING` frame and
    * IGNORE NULLS conditional first/last — the frame excludes the
    * conversion itself, and the (ts, event_id) order key makes
    * same-timestamp ties deterministic. Map-side after one user_id
    * window shuffle; no self-join (the naive formulation is a per-
    * conversion correlated subquery over the user's history).
    */
  def q110Attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prior = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, dir, "events")
      .withColumn("last_click_id",
        last(when($"event_type" === "click", $"event_id"), ignoreNulls = true)
          .over(prior))
      .withColumn("first_touch_id",
        first(when($"event_type".isin("click", "view"), $"event_id"),
          ignoreNulls = true).over(prior))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        $"last_click_id", $"first_touch_id")
      .orderBy($"event_id")
  }

  /** q114: rolling 7-day active users (the DAU/WAU pair every product
    * dashboard carries). Exact distinct counts over a sliding day range
    * — Spark has no `COUNT(DISTINCT) OVER (RANGE ...)`, so the rolling
    * window is a broadcast range join against the tiny day axis: the
    * (day, user) distinct frame is the data mass (one shuffle), each
    * pair lands in the ≤7 windows it belongs to via the broadcast, and
    * one distinct aggregate per window day finishes it. At 100 TB the
    * axis stays a few thousand rows (one per day) while the mass never
    * joins itself — the same broadcast-the-small-axis shape as q91's
    * month spine. DAU rides the same aggregate as a conditional
    * distinct count.
    */
  def q114RollingActive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val du = Tables.load(s, dir, "events")
      .select(to_date($"ts").as("day"), $"user_id").distinct()
    val axis = du.select($"day".as("window_day")).distinct()
    du.join(broadcast(axis), datediff($"window_day", $"day").between(0, 6))
      .groupBy($"window_day")
      .agg(
        count_distinct(when($"day" === $"window_day", $"user_id")).as("dau"),
        count_distinct($"user_id").as("wau_7d"))
      .orderBy($"window_day")
  }

  val q114RollingActiveSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |axis AS (SELECT DISTINCT day AS window_day FROM du)
      |SELECT axis.window_day,
      |  CAST(COUNT(DISTINCT CASE WHEN du.day = axis.window_day THEN du.user_id END) AS BIGINT) AS dau,
      |  CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau_7d
      |FROM du JOIN axis
      |  ON date_diff('day', du.day, axis.window_day) BETWEEN 0 AND 6
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q119: path analysis — the top length-3 event journeys (a -> b -> c
    * per user, consecutive by time) with traversal and user-reach
    * counts: the product-analytics "flows" report. One per-user window
    * (both lags share the frame — a second shuffle never happens) then
    * one path aggregate; top-k with a total tie-break order.
    */
  def q119EventPaths(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e1", lag($"event_type", 2).over(w))
      .withColumn("e2", lag($"event_type", 1).over(w))
      .filter($"e1".isNotNull)
      .select(concat_ws(" > ", $"e1", $"e2", $"event_type").as("path"), $"user_id")
      .groupBy($"path")
      .agg(count(lit(1)).as("n_traversals"),
        count_distinct($"user_id").as("n_users"))
      .orderBy($"n_traversals".desc, $"path")
      .limit(k)
  }

  val q119EventPathsSql: String =
    """WITH t AS (
      |  SELECT user_id,
      |    lag(event_type, 2) OVER w AS e1,
      |    lag(event_type, 1) OVER w AS e2,
      |    event_type AS e3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
      |  CAST(COUNT(*) AS BIGINT) AS n_traversals,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM t WHERE e1 IS NOT NULL
      |GROUP BY 1 ORDER BY n_traversals DESC, path LIMIT 25""".stripMargin

  /** q116: point-in-time (SCD) join — every purchase picks up the
    * dimension attributes that were valid AT ITS TIMESTAMP (signup
    * events carry the user's segment; later signups supersede earlier
    * ones). Declaratively this is an interval-containment join against
    * the q97-style validity history; executed naively it is a per-fact
    * range probe. The scale-correct form used here is the union-window
    * trick: tag dimension rows 0 and fact rows 1, union, ONE per-user
    * window ordered by (ts, tag, event_id) taking the last non-null
    * segment — no join at all, one user-keyed shuffle, ties resolved
    * dimension-first so a same-instant version applies to the fact.
    * The oracle states the interval semantics as the range join,
    * proving the two formulations equivalent.
    */
  def q116PitJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val dim = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", lit(0).as("tag"), $"event_id",
        get_json_object($"props", "$.k").cast("long").as("segment"))
    val facts = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("tag"), $"event_id",
        lit(null).cast("long").as("segment"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    dim.unionByName(facts)
      .withColumn("seg_at_ts", last($"segment", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"user_id", $"ts", $"seg_at_ts".as("segment"))
      .orderBy($"event_id")
  }

  val q116PitJoinSql: String =
    """WITH dim AS (
      |  SELECT user_id, event_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS segment,
      |    ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM events WHERE event_type = 'signup')
      |SELECT f.event_id, f.user_id, f.ts, dim.segment
      |FROM events f
      |LEFT JOIN dim ON dim.user_id = f.user_id
      |  AND dim.valid_from <= f.ts
      |  AND (dim.valid_to IS NULL OR f.ts < dim.valid_to)
      |WHERE f.event_type = 'purchase'
      |ORDER BY f.event_id""".stripMargin

  val q110AttributionSql: String =
    """SELECT event_id, user_id, ts, last_click_id, first_touch_id FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
      |    first_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch_id
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** q131: first-order Markov transition matrix over per-user event
    * sequences — the journey model behind next-action prediction and
    * flow sankeys. One per-user `lead` window produces the (src, dst)
    * stream, one grouped aggregate counts it, and the row-normalized
    * probability divides by a per-src windowed sum over the tiny
    * |types|² count frame (bounded by construction — never the event
    * mass). The oracle orders the lead by `epoch_us(ts)` because Spark
    * reads the nanos timestamps µs-truncated: sub-µs ordering must not
    * leak into sequence construction on either engine (ties break by
    * event_id). Probability is one double division cast to float.
    */
  def q131Markov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("dst", lead($"event_type", 1).over(w))
      .filter($"dst".isNotNull)
      .groupBy($"event_type".as("src"), $"dst")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", ($"n".cast("double") /
        sum($"n").over(Window.partitionBy($"src")).cast("double")).cast("float"))
      .orderBy($"src", $"dst")
  }

  val q131MarkovSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS dst
      |  FROM events),
      |c AS (
      |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  CAST(CAST(n AS DOUBLE) /
      |       CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS FLOAT) AS p
      |FROM c ORDER BY src, dst""".stripMargin

  /** q159: daily new-vs-returning decomposition — the growth-accounting
    * view every activity dashboard leads with: per day, how many active
    * users are seen for the FIRST time vs returning. Two user-keyed
    * aggregations (the active (user, day) frame and the per-user first
    * day) plus one join on the user key that reuses the same hash
    * partitioning — no window, all exact integers. At 100 TB the
    * (user, day) frame is the corpus-sized shuffle; everything after
    * is per-user/per-day scale.
    */
  def q159NewReturning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val userDays = Tables.load(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val firstDay = userDays.groupBy($"user_id").agg(min($"d").as("d0"))
    userDays.join(firstDay, "user_id")
      .groupBy($"d")
      .agg(count(lit(1)).as("n_active"),
        sum(when($"d" === $"d0", 1L).otherwise(0L)).as("n_new"))
      .select($"d".as("day"), $"n_active", $"n_new",
        ($"n_active" - $"n_new").as("n_returning"))
      .orderBy($"day")
  }

  val q159NewReturningSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |f AS (SELECT user_id, MIN(d) AS d0 FROM ud GROUP BY 1)
      |SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS n_active,
      |  CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(COUNT(*) - SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_returning
      |FROM ud JOIN f USING (user_id)
      |GROUP BY d ORDER BY day""".stripMargin

  /** q173: Markov-model backtest — train the q131 next-event transition
    * model on the first three weeks, predict each held-out transition
    * as the argmax next state, and report per-state accuracy: the
    * model-evaluation pattern (temporal split → fit → score) run
    * entirely as relational operators. Transitions are assigned by the
    * timestamp of their TARGET event (a transition is "known" only
    * once its target arrives). Deterministic argmax: count desc, then
    * lexicographic next state. Accuracy is one division of exact
    * integers. Scale: one user-keyed window builds all transitions;
    * train aggregation and test scoring are (prev, next)-keyed
    * aggregates; the fitted model frame is |states|² — broadcast.
    */
  def q173MarkovBacktest(s: SparkSession, dir: String,
      splitDay: String = "2024-01-22"): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"prev", $"event_type".as("next"), to_date($"ts").as("d"))
    val cut = lit(java.sql.Date.valueOf(splitDay))
    val fitted = trans.filter($"d" < cut)
      .groupBy($"prev", $"next").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"prev").orderBy($"cnt".desc, $"next")))
      .filter($"rk" === 1)
      .select($"prev", $"next".as("predicted"))
    trans.filter($"d" >= cut)
      .join(broadcast(fitted), Seq("prev"), "left")
      .groupBy($"prev", $"predicted")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"next" === $"predicted", 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", $"n_correct".cast("double") / $"n_test")
      .orderBy($"prev")
  }

  def q173MarkovBacktestSql(splitDay: String = "2024-01-22"): String =
    s"""WITH tr AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev,
      |    event_type AS next, CAST(ts AS DATE) AS d
      |  FROM events),
      |t AS (SELECT * FROM tr WHERE prev IS NOT NULL),
      |fit AS (
      |  SELECT prev, next AS predicted FROM (
      |    SELECT prev, next, ROW_NUMBER() OVER (PARTITION BY prev
      |      ORDER BY COUNT(*) DESC, next) AS rk
      |    FROM t WHERE d < DATE '$splitDay' GROUP BY prev, next)
      |  WHERE rk = 1)
      |SELECT t.prev, predicted, CAST(COUNT(*) AS BIGINT) AS n_test,
      |  CAST(SUM(CASE WHEN next = predicted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  CAST(SUM(CASE WHEN next = predicted THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS accuracy
      |FROM t LEFT JOIN fit ON t.prev = fit.prev
      |WHERE d >= DATE '$splitDay'
      |GROUP BY t.prev, predicted ORDER BY t.prev""".stripMargin

  /** q174: resurrected-user detection — the growth-accounting
    * complement of q159: a user "resurrects" on day d when their
    * previous active day is more than `gapDays` behind (they skipped
    * at least `gapDays` full days). Per-user activity gaps via one lag
    * window over the (user, day) distinct frame; the report is the
    * per-day resurrection count. All exact integers; at 100 TB the
    * (user, day) frame is the only corpus-sized shuffle and the window
    * rides its partitioning.
    */
  def q174Resurrected(s: SparkSession, dir: String, gapDays: Int = 2): DataFrame = {
    import s.implicits._
    val ud = Tables.load(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"d")
    ud.withColumn("prev_d", lag($"d", 1).over(w))
      .filter($"prev_d".isNotNull &&
        datediff($"d", $"prev_d") > gapDays)
      .groupBy($"d".as("day"))
      .agg(count(lit(1)).as("n_resurrected"),
        min(datediff($"d", $"prev_d")).cast("long").as("min_gap"),
        max(datediff($"d", $"prev_d")).cast("long").as("max_gap"))
      .orderBy($"day")
  }

  def q174ResurrectedSql(gapDays: Int = 2): String =
    s"""WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |l AS (
      |  SELECT user_id, d,
      |    lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      |  FROM ud)
      |SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS n_resurrected,
      |  CAST(MIN(d - prev_d) AS BIGINT) AS min_gap,
      |  CAST(MAX(d - prev_d) AS BIGINT) AS max_gap
      |FROM l WHERE prev_d IS NOT NULL AND d - prev_d > $gapDays
      |GROUP BY 1 ORDER BY day""".stripMargin

  /** q176: cart-abandonment report — per day: how many clicks were NOT
    * followed by a purchase from the same user within 24 hours. The
    * "absence within a window" predicate that naively becomes a
    * per-click correlated range probe is ONE per-user ordered window:
    * `min(purchase-ts) over (rows following)` skips nulls by aggregate
    * semantics on both engines, giving every click its next purchase
    * timestamp; the 24 h test is an exact integer µs comparison. One
    * user-keyed window shuffle; the daily report is a bounded-frame
    * aggregation.
    */
  def q176Abandonment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_purchase_us",
        min(when($"event_type" === "purchase", unix_micros($"ts"))).over(w))
      .filter($"event_type" === "click")
      .withColumn("converted",
        $"next_purchase_us".isNotNull &&
          $"next_purchase_us" - unix_micros($"ts") <= lit(86400000000L))
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_clicks"),
        sum($"converted".cast("long")).as("n_converted"))
      .select($"day", $"n_clicks", $"n_converted",
        ($"n_clicks" - $"n_converted").as("n_abandoned"),
        (($"n_clicks" - $"n_converted").cast("double") / $"n_clicks")
          .as("abandon_rate"))
      .orderBy($"day")
  }

  val q176AbandonmentSql: String =
    """WITH t AS (
      |  SELECT user_id, ts, event_type, CAST(ts AS DATE) AS day,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |      AS next_purchase_us
      |  FROM events),
      |c AS (
      |  SELECT day,
      |    next_purchase_us IS NOT NULL
      |      AND next_purchase_us - epoch_us(ts) <= 86400000000 AS converted
      |  FROM t WHERE event_type = 'click')
      |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_clicks,
      |  CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_converted,
      |  CAST(COUNT(*) - SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_abandoned,
      |  CAST(COUNT(*) - SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS abandon_rate
      |FROM c GROUP BY day ORDER BY day""".stripMargin

  /** q177: weekday seasonality profile — events per weekday, the
    * per-weekday daily mean, and the seasonality index (that weekday's
    * daily mean over the all-days daily mean): the day-of-week
    * decomposition a forecast or anomaly baseline starts from. The
    * weekday is computed as `(date − Monday-epoch) % 7` on BOTH engines
    * (0 = Monday) — never from the engines' dayofweek builtins, whose
    * numbering conventions differ. Exact integers everywhere; the two
    * divisions are fixed-shape.
    */
  def q177Seasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monday = lit(java.sql.Date.valueOf("2024-01-01")) // a Monday
    val byDay = Tables.load(s, dir, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("c"))
      .withColumn("dow", pmod(datediff($"d", monday), lit(7)).cast("int"))
    val tot = byDay.agg(sum($"c").as("n_total"), count(lit(1)).as("n_days"))
    byDay.groupBy($"dow")
      .agg(sum($"c").as("n_events"), count(lit(1)).as("n_days_dow"))
      .crossJoin(broadcast(tot))
      .select($"dow", $"n_events", $"n_days_dow",
        ($"n_events".cast("double") / $"n_days_dow").as("events_per_day"),
        (($"n_events".cast("double") / $"n_days_dow") /
          ($"n_total".cast("double") / $"n_days")).as("seasonality_idx"))
      .orderBy($"dow")
  }

  val q177SeasonalitySql: String =
    """WITH byday AS (
      |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |dw AS (
      |  SELECT ((d - DATE '2024-01-01') % 7 + 7) % 7 AS dow, c FROM byday),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
      |               CAST(COUNT(*) AS BIGINT) AS n_days FROM byday)
      |SELECT CAST(dow AS INT) AS dow, CAST(SUM(c) AS BIGINT) AS n_events,
      |  CAST(COUNT(*) AS BIGINT) AS n_days_dow,
      |  CAST(SUM(c) AS DOUBLE) / COUNT(*) AS events_per_day,
      |  (CAST(SUM(c) AS DOUBLE) / COUNT(*))
      |    / (CAST(n_total AS DOUBLE) / n_days) AS seasonality_idx
      |FROM dw CROSS JOIN tot
      |GROUP BY dow, n_total, n_days ORDER BY dow""".stripMargin

  /** q183: activation lag — per user, the time from first `signup` to
    * first subsequent `purchase`, plus the cohort summary (activation
    * rate, exact median/p90 lag): the onboarding-funnel metric growth
    * teams steer by. Two conditional min-aggregates per user (one
    * shuffle), the lag an exact µs difference; the summary percentiles
    * run on the BOUNDED per-user frame via Spark's exact `percentile`
    * ≡ DuckDB's `quantile_cont` (the q132 equivalence). Users who
    * never sign up are out of scope; signups that never purchase count
    * in the rate's denominator.
    */
  def q183Activation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.load(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "signup", unix_micros($"ts"))).as("su"),
        min(when($"event_type" === "purchase", unix_micros($"ts"))).as("pu"))
      .filter($"su".isNotNull)
      .withColumn("lag_us",
        when($"pu".isNotNull && $"pu" >= $"su", $"pu" - $"su"))
    perUser.agg(
        count(lit(1)).as("n_signed_up"),
        sum($"lag_us".isNotNull.cast("long")).as("n_activated"),
        (sum($"lag_us".isNotNull.cast("long")).cast("double") /
          count(lit(1))).as("activation_rate"),
        expr("percentile(lag_us, 0.5)").as("median_lag_us"),
        expr("percentile(lag_us, 0.9)").as("p90_lag_us"))
  }

  val q183ActivationSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS su,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pu
      |  FROM events GROUP BY 1),
      |l AS (
      |  SELECT user_id, su,
      |    CASE WHEN pu IS NOT NULL AND pu >= su THEN pu - su END AS lag_us
      |  FROM u WHERE su IS NOT NULL)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_signed_up,
      |  CAST(SUM(CASE WHEN lag_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_activated,
      |  CAST(SUM(CASE WHEN lag_us IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS activation_rate,
      |  quantile_cont(lag_us, 0.5) AS median_lag_us,
      |  quantile_cont(lag_us, 0.9) AS p90_lag_us
      |FROM l""".stripMargin

  /** q190: activity heatmap grid — event counts per (weekday × hour)
    * cell with the FULL 7×24 grid materialized (zero cells included:
    * a heatmap with holes misreads as missing data, and downstream
    * renderers expect a dense grid). One corpus aggregation; the grid
    * is a bounded cross join of two tiny literal axes. Weekday is the
    * q177 engine-neutral Monday-epoch arithmetic.
    */
  def q190Heatmap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monday = lit(java.sql.Date.valueOf("2024-01-01"))
    val obs = Tables.load(s, dir, "events")
      .groupBy(
        pmod(datediff(to_date($"ts"), monday), lit(7)).cast("int").as("dow"),
        hour($"ts").cast("int").as("hod"))
      .agg(count(lit(1)).as("c"))
    val dows = s.range(0, 7).select($"id".cast("int").as("dow"))
    val hods = s.range(0, 24).select($"id".cast("int").as("hod"))
    dows.crossJoin(hods)
      .join(obs, Seq("dow", "hod"), "left")
      .select($"dow", $"hod", coalesce($"c", lit(0L)).as("n_events"))
      .orderBy($"dow", $"hod")
  }

  val q190HeatmapSql: String =
    """WITH obs AS (
      |  SELECT CAST(((CAST(ts AS DATE) - DATE '2024-01-01') % 7 + 7) % 7
      |      AS INT) AS dow,
      |    CAST(hour(ts) AS INT) AS hod, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.dow, h.hod
      |  FROM (SELECT CAST(unnest(range(0, 7)) AS INT) AS dow) d
      |  CROSS JOIN (SELECT CAST(unnest(range(0, 24)) AS INT) AS hod) h)
      |SELECT dow, hod, COALESCE(c, 0) AS n_events
      |FROM grid LEFT JOIN obs USING (dow, hod)
      |ORDER BY dow, hod""".stripMargin

  /** q191: market-concentration index — the Herfindahl–Hirschman index
    * of customer revenue concentration per region: Σ over customers of
    * (customer share of region revenue)², the antitrust/risk metric
    * ("does one buyer dominate this market?"). Exact decimal revenue
    * sums at both levels (q185 discipline); the share-squared sum folds
    * per-customer doubles, so HHI presents as float (the q134 ln-sum
    * argument applied to a square-sum). One fact aggregation; the
    * square-sum reduces the customer frame on the same region keys.
    */
  def q191Hhi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val n = Tables.load(s, dir, "nation")
      .select($"n_nationkey", $"n_regionkey")
    val r = Tables.load(s, dir, "region").select($"r_regionkey", $"r_name")
    val dim = c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"r_name".as("region"))
    val byCust = Tables.load(s, dir, "orders")
      .join(broadcast(dim), $"o_custkey" === $"c_custkey")
      .groupBy($"region", $"o_custkey")
      .agg(sum(Exact.d2($"o_totalprice")).as("revd"))
    val byRegion = byCust.groupBy($"region").agg(sum($"revd").as("region_revd"))
    byCust.join(broadcast(byRegion), "region")
      .withColumn("share", $"revd".cast("double") / $"region_revd".cast("double"))
      .groupBy($"region")
      .agg(count(lit(1)).as("n_customers"),
        sum($"share" * $"share").cast("float").as("hhi"))
      .orderBy($"region")
  }

  val q191HhiSql: String =
    """WITH cust AS (
      |  SELECT r_name AS region, o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS revd
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |reg AS (SELECT region, SUM(revd) AS region_revd FROM cust GROUP BY 1)
      |SELECT region, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM((CAST(revd AS DOUBLE) / CAST(region_revd AS DOUBLE))
      |    * (CAST(revd AS DOUBLE) / CAST(region_revd AS DOUBLE))) AS FLOAT)
      |    AS hhi
      |FROM cust JOIN reg USING (region)
      |GROUP BY region ORDER BY region""".stripMargin

  /** q192: repeat-purchase cadence — per user the gaps between
    * consecutive purchases (one lag window), summarized as the cohort
    * distribution: repeat-purchaser count, exact median / p90 gap in
    * hours. The gap percentiles run on the bounded per-gap frame (one
    * row per repeat purchase) via exact `percentile` ≡ `quantile_cont`.
    */
  def q192RepeatCadence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gaps = Tables.load(s, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .filter($"prev_us".isNotNull)
      .withColumn("gap_hours",
        (unix_micros($"ts") - $"prev_us").cast("double") / lit(3600000000.0))
    gaps.agg(
      count(lit(1)).as("n_repeat_purchases"),
      count_distinct($"user_id").as("n_repeat_buyers"),
      expr("percentile(gap_hours, 0.5)").as("median_gap_hours"),
      expr("percentile(gap_hours, 0.9)").as("p90_gap_hours"))
  }

  val q192RepeatCadenceSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS DOUBLE) / 3600000000.0 AS gap_hours
      |  FROM events WHERE event_type = 'purchase')
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat_purchases,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_repeat_buyers,
      |  quantile_cont(gap_hours, 0.5) AS median_gap_hours,
      |  quantile_cont(gap_hours, 0.9) AS p90_gap_hours
      |FROM g WHERE gap_hours IS NOT NULL""".stripMargin

  /** Distributed global row_number over `order` (q153's range-partition +
    * per-partition rank + broadcast offset shape): no single-partition
    * window at any scale. Appends column `rnCol`.
    */
  private def grn(df: DataFrame, rnCol: String, parts: Int,
      order: Column*): DataFrame = {
    val (ranged, off) = Prefix.boundedPrefix(df, parts, lit(1L), order: _*)
    ranged.withColumn("_prn", row_number().over(
        Window.partitionBy(col("pid")).orderBy(order: _*)).cast("long"))
      .join(broadcast(off), "pid")
      .withColumn(rnCol, col("_prn") + col("off"))
      .drop("pid", "_prn", "off")
  }

  /** q163: RFM segmentation of purchasers — per user: Recency (days
    * since last purchase, vs the corpus max day), Frequency (purchase
    * count), Monetary (exact-decimal spend), each scored into quintiles
    * (1 = best). The canonical CRM / training-data-curation "rank users
    * by engagement" operator.
    *
    * The quintile is SQL `ntile(5)` semantics — first n%5 buckets get
    * one extra row — but computed from a GLOBAL row_number via the
    * explicit integer formula (`DIV`, `%`) on BOTH engines, so no
    * native-ntile implementation difference can bite, and the
    * row_number itself is the q153 distributed range-partition rank:
    * three rank passes over the per-user frame (already aggregated —
    * tiny vs events), no single-partition window anywhere. Ordering
    * ties break on user_id, making every rank — hence every score —
    * deterministic. Monetary ranks compare exact decimals.
    */
  def q163Rfm(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val p = Tables.load(s, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", to_date($"ts").as("d"),
        Exact.d2($"value").as("v"))
    val u = p.groupBy($"user_id").agg(
      max($"d").as("last_d"), count(lit(1)).as("frequency"),
      sum($"v").as("mon"))
    val mx = u.agg(max($"last_d").as("maxd"))
    val base = u.crossJoin(broadcast(mx))
      .withColumn("recency_days", datediff($"maxd", $"last_d").cast("long"))
      .drop("maxd")
    val ranked = grn(grn(grn(base,
      "rrn", parts, $"recency_days".asc, $"user_id".asc),
      "frn", parts, $"frequency".desc, $"user_id".asc),
      "mrn", parts, $"mon".desc, $"user_id".asc)
    val n = u.agg(count(lit(1)).as("n_users"))
    def bucket(rn: String): Column = expr(
      s"CAST(CASE WHEN $rn <= (q + 1) * r THEN ($rn + q) DIV (q + 1) " +
        s"ELSE r + ($rn - (q + 1) * r + q - 1) DIV q END AS INT)")
    ranked.crossJoin(broadcast(n))
      .withColumn("q", expr("n_users DIV 5"))
      .withColumn("r", expr("n_users % 5"))
      .select($"user_id", $"recency_days", $"frequency",
        $"mon".cast("double").as("monetary"),
        bucket("rrn").as("r_score"), bucket("frn").as("f_score"),
        bucket("mrn").as("m_score"))
      .withColumn("segment",
        concat($"r_score".cast("string"), $"f_score".cast("string"),
          $"m_score".cast("string")).cast("int"))
      .orderBy($"user_id")
  }

  val q163RfmSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |u AS (
      |  SELECT user_id, MAX(d) AS last_d,
      |    CAST(COUNT(*) AS BIGINT) AS frequency, SUM(v) AS mon
      |  FROM p GROUP BY 1),
      |mx AS (SELECT MAX(last_d) AS maxd FROM u),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM u),
      |base AS (
      |  SELECT user_id, CAST(maxd - last_d AS BIGINT) AS recency_days,
      |    frequency, mon
      |  FROM u CROSS JOIN mx),
      |ranked AS (
      |  SELECT *,
      |    CAST(row_number() OVER (ORDER BY recency_days, user_id) AS BIGINT) AS rrn,
      |    CAST(row_number() OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS frn,
      |    CAST(row_number() OVER (ORDER BY mon DESC, user_id) AS BIGINT) AS mrn
      |  FROM base),
      |scored AS (
      |  SELECT user_id, recency_days, frequency,
      |    CAST(mon AS DOUBLE) AS monetary,
      |    CAST(CASE WHEN rrn <= (n_users // 5 + 1) * (n_users % 5)
      |      THEN (rrn + n_users // 5) // (n_users // 5 + 1)
      |      ELSE n_users % 5 + (rrn - (n_users // 5 + 1) * (n_users % 5)
      |        + n_users // 5 - 1) // (n_users // 5) END AS INT) AS r_score,
      |    CAST(CASE WHEN frn <= (n_users // 5 + 1) * (n_users % 5)
      |      THEN (frn + n_users // 5) // (n_users // 5 + 1)
      |      ELSE n_users % 5 + (frn - (n_users // 5 + 1) * (n_users % 5)
      |        + n_users // 5 - 1) // (n_users // 5) END AS INT) AS f_score,
      |    CAST(CASE WHEN mrn <= (n_users // 5 + 1) * (n_users % 5)
      |      THEN (mrn + n_users // 5) // (n_users // 5 + 1)
      |      ELSE n_users % 5 + (mrn - (n_users // 5 + 1) * (n_users % 5)
      |        + n_users // 5 - 1) // (n_users // 5) END AS INT) AS m_score
      |  FROM ranked CROSS JOIN n)
      |SELECT *, CAST(r_score || f_score || m_score AS INT) AS segment
      |FROM scored ORDER BY user_id""".stripMargin

  /** q217: time-decay attribution — q110's last/first-touch rules give
    * the whole conversion to ONE event; the industry's time-decay model
    * splits each purchase across every click/view in its 24-hour
    * lookback, weighted `e^(−age_hours/10)` and normalized per
    * conversion so shares sum to 1. Weights are fixed-shape doubles of
    * exact integer µs ages; the per-conversion normalizer and the
    * per-channel totals both fold in explicit key order (the q104
    * discipline), and the final credit presents as float (the `exp`
    * ULP rule). At 100 TB: one user-keyed interval join (lookback
    * bounded), one conversion-keyed fold, one channel aggregate.
    */
  def q217TimeDecayAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
    val conv = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"us".as("pus"))
    val touch = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"event_id".as("tid"), $"event_type".as("channel"),
        $"us".as("tus"))
    val pairs = conv.join(touch, "user_id")
      .filter($"tus" < $"pus" && $"pus" - $"tus" <= 24L * 3600L * 1000000L)
      .withColumn("w",
        exp(($"tus" - $"pus").cast("double") / lit(36000000000.0)))
    val norm = pairs.groupBy($"pid")
      .agg(LangModel.orderedSum($"tid", $"w").as("sw"))
    pairs.join(norm, "pid")
      .withColumn("share", $"w" / $"sw")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_touches"),
        count_distinct($"pid").as("n_conversions"),
        LangModel.orderedSum(struct($"pid", $"tid"), $"share").as("cr"))
      .select($"channel", $"n_touches", $"n_conversions",
        $"cr".cast("float").as("credit"))
      .orderBy($"channel")
  }

  val q217TimeDecayAttributionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |conv AS (
      |  SELECT user_id, event_id AS pid, us AS pus
      |  FROM ev WHERE event_type = 'purchase'),
      |touch AS (
      |  SELECT user_id, event_id AS tid, event_type AS channel, us AS tus
      |  FROM ev WHERE event_type IN ('click', 'view')),
      |pairs AS (
      |  SELECT pid, tid, channel,
      |    exp(CAST(tus - pus AS DOUBLE) / 36000000000.0) AS w
      |  FROM conv JOIN touch USING (user_id)
      |  WHERE tus < pus AND pus - tus <= 86400000000),
      |norm AS (
      |  SELECT pid, list_sum(list(w ORDER BY tid)) AS sw
      |  FROM pairs GROUP BY 1),
      |sh AS (
      |  SELECT pairs.pid, tid, channel, w / sw AS share
      |  FROM pairs JOIN norm ON pairs.pid = norm.pid)
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_conversions,
      |  CAST(list_sum(list(share ORDER BY pid, tid)) AS FLOAT) AS credit
      |FROM sh GROUP BY channel ORDER BY channel""".stripMargin

  /** q209: cohort LTV curve — cumulative revenue per user by cohort
    * age, the money-sided completion of q109's retention matrix (who
    * is still here) and q163's RFM snapshot (where they are now): for
    * each first-purchase-month cohort, how much has the average member
    * spent by month 0, 1, 2, …? Months are exact integer indices
    * (`year·12 + month` — no engine interval arithmetic); revenue
    * lifts to integer cents; the cumulative sum rides a cohort-keyed
    * window over the bounded month axis; and the per-user division is
    * the single double op. At 100 TB: one purchase scan, a user-keyed
    * first-purchase aggregate, a (cohort, age) aggregate, and the
    * bounded-frame window.
    */
  def q209LtvCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.load(s, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id",
        (year($"ts") * 12 + month($"ts")).cast("long").as("mi"),
        round($"value" * 100).cast("long").as("cents"))
    val first = p.groupBy($"user_id").agg(min($"mi").as("cm"))
    val size = first.groupBy($"cm").agg(count(lit(1)).as("n_users"))
    val rev = p.join(first, "user_id")
      .groupBy($"cm", ($"mi" - $"cm").as("age_mo"))
      .agg(sum($"cents").as("rev_cents"))
    val byCohort = Window.partitionBy($"cm").orderBy($"age_mo")
    rev.join(size, "cm")
      .withColumn("cum_rev_cents", sum($"rev_cents").over(byCohort))
      .select($"cm".as("cohort_month_idx"), $"age_mo", $"n_users",
        $"rev_cents", $"cum_rev_cents",
        ($"cum_rev_cents".cast("double") / $"n_users").as("cum_rev_per_user"))
      .orderBy($"cohort_month_idx", $"age_mo")
  }

  val q209LtvCurveSql: String =
    """WITH p AS (
      |  SELECT user_id,
      |    CAST(year(ts) * 12 + month(ts) AS BIGINT) AS mi,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (SELECT user_id, CAST(MIN(mi) AS BIGINT) AS cm FROM p GROUP BY 1),
      |sz AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_users FROM f GROUP BY 1),
      |rev AS (
      |  SELECT f.cm, p.mi - f.cm AS age_mo, CAST(SUM(cents) AS BIGINT) AS rev_cents
      |  FROM p JOIN f USING (user_id) GROUP BY 1, 2),
      |cum AS (
      |  SELECT cm, age_mo, rev_cents,
      |    CAST(SUM(rev_cents) OVER (PARTITION BY cm ORDER BY age_mo
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_cents
      |  FROM rev)
      |SELECT cm AS cohort_month_idx, age_mo, n_users, rev_cents, cum_rev_cents,
      |  CAST(cum_rev_cents AS DOUBLE) / n_users AS cum_rev_per_user
      |FROM cum JOIN sz USING (cm)
      |ORDER BY cohort_month_idx, age_mo""".stripMargin

  /** q225: Markov removal-effect attribution — the data-driven
    * multi-touch attribution model (Anderl et al.'s public removal
    * -effect formulation, the one "Markov attribution" means in every
    * marketing stack): build the first-order journey chain over event
    * types (START at a user's first event and after each absorbing
    * purchase; END after a final non-purchase event; purchase absorbs),
    * estimate transition probabilities from corpus counts, compute the
    * chain's conversion (absorption-at-purchase) probability, then
    * re-compute it with each channel REMOVED (its transitions redirect
    * to the null sink, mass not renormalized — the standard form);
    * removal_effect(c) = 1 − P_removed/P_full, the share of conversions
    * that needed the channel. The absorption probabilities iterate
    * exactly `rounds` rounds on BOTH engines (the q215 bounded-round
    * discipline — absorption is a fixpoint SQL cannot state directly),
    * and every per-state accumulation is an ORDERED fold over dst (the
    * ordered-list reduce on the oracle side), so the double sequences
    * are bit-identical; results present as FLOAT per the house rule.
    *
    * Scale shape: the corpus-sized work is one user-keyed window + one
    * (src, dst) count aggregate; the transition matrix is bounded by
    * (|event types| + 2)² — the driver-side solve is O(rounds · states
    * · channels) on a ≤36-row matrix, never corpus-scale.
    */
  def q225MarkovRemoval(s: SparkSession, dir: String, rounds: Int = 20): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val ord = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev", lag($"event_type", 1).over(w))
      .withColumn("nxt", lead($"event_type", 1).over(w))
    val incoming = ord.select(
      when($"prev".isNull || $"prev" === "purchase", lit("__start__"))
        .otherwise($"prev").as("src"),
      $"event_type".as("dst"))
    val terminal = ord.filter($"nxt".isNull && $"event_type" =!= "purchase")
      .select($"event_type".as("src"), lit("__end__").as("dst"))
    val cnt = incoming.unionByName(terminal)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
    // bounded by construction: ≤ (|event types| + 1) × (|event types| + 2)
    val rows = cnt.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totals = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._3).sum }
    val probs = rows.map { case (src, dst, n) => (src, dst, n.toDouble / totals(src)) }
    val channels = probs.map(_._1).distinct
      .filter(c => c != "__start__" && c != "purchase").sorted.toSeq

    def absorbStart(removed: Option[String]): Double = {
      val tr = probs.filter { case (src, dst, _) =>
        !removed.contains(src) && !removed.contains(dst) }
      val pconv = tr.filter(_._2 == "purchase").map(t => t._1 -> t._3).toMap
      val ttrans = tr.filter(t => t._2 != "purchase" && t._2 != "__end__")
        .groupBy(_._1).map { case (src, ts0) => src -> ts0.sortBy(_._2).toSeq }
      val states = tr.map(_._1).distinct.toSeq
      var prob = states.map(_ -> 0.0).toMap
      for (_ <- 1 to rounds) {
        prob = states.map { st =>
          // ordered left fold over ascending dst — the identical IEEE
          // sequence as the oracle's list(... ORDER BY dst) reduce;
          // a dst with no state row contributes an exact +0.0 no-op
          val acc = ttrans.getOrElse(st, Seq.empty)
            .foldLeft(0.0) { case (a, (_, dst, pr)) =>
              a + pr * prob.getOrElse(dst, 0.0) }
          st -> (pconv.getOrElse(st, 0.0) + acc)
        }.toMap
      }
      prob.getOrElse("__start__", 0.0)
    }

    val pFull = absorbStart(None)
    val out = channels.map { c =>
      val pr = absorbStart(Some(c))
      val eff: Option[Float] =
        if (pFull == 0.0) None else Some((1.0 - pr / pFull).toFloat)
      (c, pFull.toFloat, pr.toFloat, eff)
    }
    out.toDF("channel", "p_full", "p_removed", "removal_effect")
      .orderBy($"channel")
  }

  def q225MarkovRemovalSql(rounds: Int = 20): String = {
    def roundCte(k: Int) =
      s"""p$k AS MATERIALIZED (
         |  SELECT s.removed, s.state,
         |    COALESCE(pc.p, CAST(0 AS DOUBLE)) +
         |    COALESCE(agg.acc, CAST(0 AS DOUBLE)) AS prob
         |  FROM states s
         |  LEFT JOIN pconv pc ON pc.removed = s.removed AND pc.src = s.state
         |  LEFT JOIN (
         |    SELECT tt.removed, tt.src,
         |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |          list(tt.p * pv.prob ORDER BY tt.dst)),
         |        (a, x) -> a + x) AS acc
         |    FROM ttrans tt JOIN p${k - 1} pv
         |      ON pv.removed = tt.removed AND pv.state = tt.dst
         |    GROUP BY 1, 2) agg
         |    ON agg.removed = s.removed AND agg.src = s.state)""".stripMargin
    val roundCtes = (1 to rounds).map(roundCte).mkString(",\n")
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
      |ord0 AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
      |  FROM ev),
      |seq AS (
      |  SELECT CASE WHEN prev IS NULL OR prev = 'purchase'
      |              THEN '__start__' ELSE prev END AS src,
      |    event_type AS dst
      |  FROM ord0
      |  UNION ALL
      |  SELECT event_type, '__end__' FROM ord0
      |  WHERE nxt IS NULL AND event_type <> 'purchase'),
      |cnt AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM seq GROUP BY 1, 2),
      |tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS tn FROM cnt GROUP BY 1),
      |tr AS (SELECT cnt.src, cnt.dst, CAST(n AS DOUBLE) / tn AS p
      |       FROM cnt JOIN tot ON tot.src = cnt.src),
      |scen AS (
      |  SELECT '__full__' AS removed
      |  UNION ALL
      |  SELECT DISTINCT src FROM tr
      |  WHERE src NOT IN ('__start__', 'purchase')),
      |strans AS (
      |  SELECT sc.removed, t.src, t.dst, t.p
      |  FROM scen sc JOIN tr t
      |    ON t.src <> sc.removed AND t.dst <> sc.removed),
      |pconv AS (SELECT removed, src, p FROM strans WHERE dst = 'purchase'),
      |ttrans AS (SELECT removed, src, dst, p FROM strans
      |           WHERE dst NOT IN ('purchase', '__end__')),
      |states AS (SELECT DISTINCT removed, src AS state FROM strans),
      |p0 AS MATERIALIZED (
      |  SELECT removed, state, CAST(0 AS DOUBLE) AS prob FROM states),
      |$roundCtes,
      |res AS (SELECT removed, prob FROM p$rounds WHERE state = '__start__'),
      |pf AS (SELECT prob AS pfull FROM res WHERE removed = '__full__')
      |SELECT r.removed AS channel,
      |  CAST(pf.pfull AS FLOAT) AS p_full,
      |  CAST(r.prob AS FLOAT) AS p_removed,
      |  CAST(CASE WHEN pf.pfull = 0 THEN NULL
      |            ELSE 1.0 - r.prob / pf.pfull END AS FLOAT) AS removal_effect
      |FROM res r, pf WHERE r.removed <> '__full__'
      |ORDER BY channel""".stripMargin
  }

  /** q226: CUPED variance-reduced A/B readout (Deng et al.'s public
    * "Controlled-experiment Using Pre-Experiment Data" formulation —
    * the standard modern experimentation estimator): users split into
    * two arms by the q39 portable md5 hash, the experiment window is
    * the second half of the event-time range, and each user's
    * pre-period purchase spend is the covariate. θ = cov(x,y)/var(x)
    * from the POOLED population, adjusted metric y − θ·(x − x̄), and
    * per arm the plain mean, the CUPED mean, and the variance-reduction
    * factor 1 − var(y_adj)/var(y) (expanded exactly as
    * var(y) − 2θcov(x,y) + θ²var(x), never a second data pass).
    *
    * Cross-engine exactness: spend lifts to integer CENTS, every
    * per-user and per-arm aggregate is a BIGINT sum, and every
    * statistic is ONE fixed-shape double expression over those sums
    * (the q85/q205 recipe), presented FLOAT. The corpus-sized work is
    * one scan + one user aggregate + one arm aggregate; θ and the
    * global x̄ ride a broadcast one-row frame.
    */
  def q226Cuped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", unix_micros($"ts").as("us"),
        when($"event_type" === "purchase",
          round($"value" * 100).cast("long")).otherwise(0L).as("cents"))
    val bounds = ev.agg(min($"us").as("mn"), max($"us").as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy($"user_id")
      .agg(sum(when($"us" < $"mid", $"cents").otherwise(0L)).as("x"),
        sum(when($"us" >= $"mid", $"cents").otherwise(0L)).as("y"))
      .withColumn("arm",
        when((conv(substring(md5(concat(lit("arm:"), $"user_id".cast("string"))), 1, 8),
          16, 10).cast("long") % 100) < 50, "A").otherwise("B"))
    def stats(grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = grouped
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
    // θ = cov/var_x is undefined on a corpus with constant pre-period
    // spend (var_x = 0); guard to NULL so both engines agree instead of
    // Spark-NULL vs DuckDB-Inf divergence.
    val gVarX = $"sxx".cast("double") / $"n" -
      ($"sx".cast("double") / $"n") * ($"sx".cast("double") / $"n")
    val g = stats(perUser.groupBy())
      .select(
        ($"sx".cast("double") / $"n").as("gxbar"),
        when(gVarX === 0.0, lit(null).cast("double"))
          .otherwise(($"sxy".cast("double") / $"n" -
            ($"sx".cast("double") / $"n") * ($"sy".cast("double") / $"n")) / gVarX)
          .as("theta"))
    stats(perUser.groupBy($"arm"))
      .crossJoin(broadcast(g))
      .select($"arm", $"n".as("n_users"),
        ($"sy".cast("double") / $"n").as("mean_y"),
        ($"sx".cast("double") / $"n").as("mean_x"),
        ($"syy".cast("double") / $"n" -
          ($"sy".cast("double") / $"n") * ($"sy".cast("double") / $"n")).as("var_y"),
        ($"sxx".cast("double") / $"n" -
          ($"sx".cast("double") / $"n") * ($"sx".cast("double") / $"n")).as("var_x"),
        ($"sxy".cast("double") / $"n" -
          ($"sx".cast("double") / $"n") * ($"sy".cast("double") / $"n")).as("cov_xy"),
        $"gxbar", $"theta")
      .select($"arm", $"n_users",
        $"mean_y".cast("float").as("mean_y"),
        ($"mean_y" - $"theta" * ($"mean_x" - $"gxbar")).cast("float")
          .as("mean_y_cuped"),
        when($"var_y" === 0.0, lit(null).cast("float"))
          .otherwise((lit(1.0) -
            ($"var_y" - lit(2.0) * $"theta" * $"cov_xy" +
              $"theta" * $"theta" * $"var_x") / $"var_y").cast("float"))
          .as("var_reduction"))
      .orderBy($"arm")
  }

  val q226CupedSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
      |  FROM events),
      |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT) AS y
      |  FROM ev, b GROUP BY 1),
      |armed AS (
      |  SELECT x, y,
      |    CASE WHEN CAST(('0x' || substring(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
      |         THEN 'A' ELSE 'B' END AS arm
      |  FROM pu),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM armed),
      |gg AS (
      |  SELECT CAST(sx AS DOUBLE) / n AS gxbar,
      |    CASE WHEN CAST(sxx AS DOUBLE) / n -
      |              (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) = 0
      |         THEN NULL
      |         ELSE (CAST(sxy AS DOUBLE) / n -
      |           (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) /
      |         (CAST(sxx AS DOUBLE) / n -
      |           (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) END AS theta
      |  FROM g),
      |a AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM armed GROUP BY 1),
      |m AS (
      |  SELECT arm, n AS n_users,
      |    CAST(sy AS DOUBLE) / n AS mean_y,
      |    CAST(sx AS DOUBLE) / n AS mean_x,
      |    CAST(syy AS DOUBLE) / n -
      |      (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS var_y,
      |    CAST(sxx AS DOUBLE) / n -
      |      (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS var_x,
      |    CAST(sxy AS DOUBLE) / n -
      |      (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS cov_xy,
      |    gg.gxbar, gg.theta
      |  FROM a, gg)
      |SELECT arm, n_users,
      |  CAST(mean_y AS FLOAT) AS mean_y,
      |  CAST(mean_y - theta * (mean_x - gxbar) AS FLOAT) AS mean_y_cuped,
      |  CAST(CASE WHEN var_y = 0 THEN NULL
      |            ELSE 1.0 - (var_y - 2.0 * theta * cov_xy +
      |                        theta * theta * var_x) / var_y END AS FLOAT)
      |    AS var_reduction
      |FROM m ORDER BY arm""".stripMargin

  /** q235: Bradley–Terry preference-strength fitting — the estimator
    * behind RLHF reward modeling and LLM-arena leaderboards (public
    * Bradley–Terry 1952 model, Hunter 2004 MM algorithm; the Chatbot
    * Arena Elo is this model): items acquire latent strengths π from
    * pairwise win counts, P(i beats j) = π_i/(π_i+π_j). Duels derive
    * deterministically from the corpus: for each user and each pair of
    * event types both present in that user's history, the type with the
    * strictly larger event count wins one duel (ties carry no signal
    * and are dropped). The MM update
    * π_i ← W_i / Σ_j n_ij/(π_i+π_j), followed by a sum-normalization,
    * iterates exactly `rounds` rounds on BOTH engines — the q225
    * bounded-round discipline, with every accumulation an ORDERED fold
    * (opponents ascending, then items ascending) so the double
    * sequences are bit-identical; strengths present as FLOAT, the rank
    * orders on the pre-rounding double.
    *
    * Scale shape: the corpus-sized work is one (user, event_type)
    * aggregate and one user-keyed self-equijoin whose fan-out is
    * bounded by |event types|² per user; the duel matrix is ≤ T(T−1)
    * rows, so the driver-side solve is O(rounds·T²) on a bounded
    * frame — never corpus-scale (the q225 contract). An item whose
    * win count is zero pins at strength 0 (Hunter's condition: its
    * MLE diverges to 0; documented rather than smoothed).
    */
  /** q241: daily sample-ratio-mismatch (SRM) audit — the first
    * diagnostic every experimentation platform runs before reading an
    * A/B result (Fabijan et al. 2019, "Diagnosing Sample Ratio
    * Mismatch", public): per day, the count of active users landing in
    * each arm of the q226 50/50 md5 assignment, the χ² goodness-of-fit
    * statistic against the designed split, and a flag at the df=1 5%
    * critical value (3.841459, a literal on both engines — no p-value,
    * so no special-function libm divergence). A day that flags means
    * assignment, logging, or ramp broke THAT day — the q226 readout
    * is untrustworthy until explained.
    *
    * Exactness: daily arm counts are exact integers over distinct
    * (day, user) pairs; χ² is ONE fixed-shape double expression over
    * them, float-presented; the flag compares the pre-rounding double
    * against the literal identically on both engines.
    *
    * Scale shape: one scan → one (day, user) distinct → one day-keyed
    * aggregate; output bounded by the day axis.
    */
  def q241SrmCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val armed = Tables.load(s, dir, "events")
      .select(to_date($"ts").as("day"), $"user_id")
      .distinct()
      .withColumn("arm",
        when((conv(substring(md5(concat(lit("arm:"), $"user_id".cast("string"))), 1, 8),
          16, 10).cast("long") % 100) < 50, "A").otherwise("B"))
    val daily = armed.groupBy($"day").agg(
      sum(when($"arm" === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === "B", 1L).otherwise(0L)).as("n_b"))
    def e = ($"n_a" + $"n_b").cast("double") / lit(2.0)
    val chi2 = ($"n_a".cast("double") - e) * ($"n_a".cast("double") - e) / e +
      ($"n_b".cast("double") - e) * ($"n_b".cast("double") - e) / e
    daily.select($"day", $"n_a", $"n_b",
        chi2.cast("float").as("chi2"),
        (chi2 > lit(3.841459)).as("srm_flag"))
      .orderBy($"day")
  }

  val q241SrmCheckSql: String = {
    val e = "CAST(n_a + n_b AS DOUBLE) / 2.0"
    val chi2 = s"(CAST(n_a AS DOUBLE) - $e) * (CAST(n_a AS DOUBLE) - $e) / ($e)" +
      s" + (CAST(n_b AS DOUBLE) - $e) * (CAST(n_b AS DOUBLE) - $e) / ($e)"
    s"""WITH ud AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |a AS (
      |  SELECT day,
      |    CASE WHEN CAST(('0x' || substring(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
      |         THEN 'A' ELSE 'B' END AS arm
      |  FROM ud),
      |g AS (
      |  SELECT day,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM a GROUP BY day)
      |SELECT day, n_a, n_b,
      |  CAST($chi2 AS FLOAT) AS chi2,
      |  ($chi2) > 3.841459 AS srm_flag
      |FROM g ORDER BY day""".stripMargin
  }

  /** q243: anytime-valid sequential assignment monitor — Wald's SPRT
    * (1945) in its modern e-process reading (Ramdas et al.: an e-value
    * you may check EVERY day and stop the moment it crosses 1/α
    * without inflating the false-alarm rate — the always-valid
    * property fixed-horizon tests like q241's χ² lack): each newly
    * assigned user is a Bernoulli(½) trial under the null of fair
    * assignment; against the drift alternative p = 0.55 the cumulative
    * log likelihood ratio is `cum_a·ln(0.55/0.5) + cum_b·ln(0.45/0.5)`
    * and the monitor rejects when e = exp(LLR) ≥ 1/α = 20. Reported
    * per day over first-seen users, so q241 (daily snapshot test) and
    * q243 (sequential accumulation) are the two standard SRM guards
    * side by side.
    *
    * Exactness: cumulative counts are exact integers; LLR is one
    * fixed-shape double chain whose `ln` arguments are identical
    * literals on both engines; `ln`/`exp` present as FLOAT (q104
    * rule), the flag comparing the pre-rounding double to the literal
    * threshold identically on both sides.
    *
    * Scale shape: one scan → one user aggregate (first-seen day) →
    * one day aggregate; the cumulative window runs over the bounded
    * day axis (the q162 pattern).
    */
  def q243Sprt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firstSeen = Tables.load(s, dir, "events")
      .groupBy($"user_id").agg(min(to_date($"ts")).as("day"))
      .withColumn("arm",
        when((conv(substring(md5(concat(lit("arm:"), $"user_id".cast("string"))), 1, 8),
          16, 10).cast("long") % 100) < 50, "A").otherwise("B"))
    val daily = firstSeen.groupBy($"day").agg(
      sum(when($"arm" === "A", 1L).otherwise(0L)).as("new_a"),
      sum(when($"arm" === "B", 1L).otherwise(0L)).as("new_b"))
    val byDay = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val llr = $"cum_a".cast("double") * log(lit(0.55) / lit(0.5)) +
      $"cum_b".cast("double") * log(lit(0.45) / lit(0.5))
    daily
      .withColumn("cum_a", sum($"new_a").over(byDay))
      .withColumn("cum_b", sum($"new_b").over(byDay))
      .select($"day", $"new_a", $"new_b", $"cum_a", $"cum_b",
        llr.cast("float").as("log_e"),
        exp(llr).cast("float").as("e_value"),
        (exp(llr) >= lit(20.0)).as("reject"))
      .orderBy($"day")
  }

  val q243SprtSql: String = {
    val llr = "CAST(cum_a AS DOUBLE) * ln(CAST(0.55 AS DOUBLE) / CAST(0.5 AS DOUBLE))" +
      " + CAST(cum_b AS DOUBLE) * ln(CAST(0.45 AS DOUBLE) / CAST(0.5 AS DOUBLE))"
    s"""WITH fs AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id),
      |ar AS (
      |  SELECT day,
      |    CASE WHEN CAST(('0x' || substring(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
      |         THEN 'A' ELSE 'B' END AS arm
      |  FROM fs),
      |g AS (
      |  SELECT day,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS new_a,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS new_b
      |  FROM ar GROUP BY day),
      |c AS (
      |  SELECT day, new_a, new_b,
      |    CAST(SUM(new_a) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
      |    CAST(SUM(new_b) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
      |  FROM g)
      |SELECT day, new_a, new_b, cum_a, cum_b,
      |  CAST($llr AS FLOAT) AS log_e,
      |  CAST(exp($llr) AS FLOAT) AS e_value,
      |  exp($llr) >= CAST(20.0 AS DOUBLE) AS reject
      |FROM c ORDER BY day""".stripMargin
  }

  def q235BradleyTerry(s: SparkSession, dir: String, rounds: Int = 20): DataFrame = {
    import s.implicits._
    val u = Tables.load(s, dir, "events")
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // referenced by both self-join branches
    val d = u.as("a").join(u.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" < $"b.event_type")
      .filter($"a.n" =!= $"b.n")
      .select(
        when($"a.n" > $"b.n", $"a.event_type").otherwise($"b.event_type").as("winner"),
        when($"a.n" > $"b.n", $"b.event_type").otherwise($"a.event_type").as("loser"))
      .groupBy($"winner", $"loser").agg(count(lit(1)).as("w"))
    // bounded by construction: ≤ |event types| · (|event types| − 1) rows
    val duelRows = d.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val nij = scala.collection.mutable.Map.empty[(String, String), Long]
    duelRows.foreach { case (w, l, c) =>
      nij((w, l)) = nij.getOrElse((w, l), 0L) + c
      nij((l, w)) = nij.getOrElse((l, w), 0L) + c
    }
    val items = nij.keys.map(_._1).toSeq.distinct.sorted
    val wins = items.map(i =>
      i -> duelRows.filter(_._1 == i).map(_._3).sum).toMap
    val opp = items.map(i => i -> items.filter(j => nij.contains((i, j)))
      .sorted.map(j => (j, nij((i, j))))).toMap
    var pi = items.map(_ -> 1.0).toMap
    for (_ <- 1 to rounds) {
      // ordered folds: opponents ascending inside each item, items
      // ascending for the normalizer — the oracle's list(... ORDER BY)
      // reduces execute the identical IEEE sequence
      val raw = items.map { i =>
        val den = opp(i).foldLeft(0.0) { case (a, (j, c)) =>
          a + c / (pi(i) + pi(j)) }
        i -> (if (wins(i) == 0L || den == 0.0) 0.0 else wins(i) / den)
      }
      val sum = raw.foldLeft(0.0)(_ + _._2)
      pi = raw.map { case (i, v) => i -> v / sum }.toMap
    }
    val ranked = items.map { i =>
      (i, wins(i), opp(i).map(_._2).sum, pi(i))
    }.sortBy { case (i, _, _, p) => (-p, i) }.zipWithIndex.map {
      case ((i, w, dl, p), idx) => (i, w, dl, p.toFloat, (idx + 1).toLong)
    }
    ranked.toDF("item", "wins", "duels", "strength", "rank")
      .orderBy($"item")
  }

  def q235BradleyTerrySql(rounds: Int = 20): String = {
    def roundCte(k: Int) =
      s"""raw$k AS MATERIALIZED (
         |  SELECT w.i,
         |    CASE WHEN w.wins = 0 OR COALESCE(acc.den, CAST(0 AS DOUBLE)) = 0
         |         THEN CAST(0 AS DOUBLE) ELSE w.wins / acc.den END AS pi_raw
         |  FROM wins w LEFT JOIN (
         |    SELECT np.i, list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |        list(np.nij / (pa.pi + pb.pi) ORDER BY np.j)),
         |      (a, x) -> a + x) AS den
         |    FROM np JOIN p${k - 1} pa ON pa.i = np.i
         |      JOIN p${k - 1} pb ON pb.i = np.j
         |    GROUP BY np.i) acc ON acc.i = w.i),
         |p$k AS MATERIALIZED (
         |  SELECT r.i, r.pi_raw / s.s AS pi
         |  FROM raw$k r CROSS JOIN (
         |    SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |        list(pi_raw ORDER BY i)), (a, x) -> a + x) AS s
         |    FROM raw$k) s)""".stripMargin
    val roundCtes = (1 to rounds).map(roundCte).mkString(",\n")
    s"""WITH u AS (
      |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT CASE WHEN a.n > b.n THEN a.event_type ELSE b.event_type END AS winner,
      |    CASE WHEN a.n > b.n THEN b.event_type ELSE a.event_type END AS loser,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM u a JOIN u b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  WHERE a.n <> b.n GROUP BY 1, 2),
      |np AS (
      |  SELECT i, j, CAST(SUM(w) AS BIGINT) AS nij FROM (
      |    SELECT winner AS i, loser AS j, w FROM d
      |    UNION ALL SELECT loser, winner, w FROM d)
      |  GROUP BY 1, 2),
      |items AS (SELECT DISTINCT i FROM np),
      |wins AS (
      |  SELECT it.i, CAST(COALESCE(SUM(d.w), 0) AS BIGINT) AS wins
      |  FROM items it LEFT JOIN d ON d.winner = it.i GROUP BY it.i),
      |p0 AS MATERIALIZED (SELECT i, CAST(1.0 AS DOUBLE) AS pi FROM items),
      |$roundCtes,
      |dd AS (SELECT i, CAST(SUM(nij) AS BIGINT) AS duels FROM np GROUP BY i)
      |SELECT w.i AS item, w.wins, dd.duels,
      |  CAST(p.pi AS FLOAT) AS strength,
      |  CAST(ROW_NUMBER() OVER (ORDER BY p.pi DESC, w.i) AS BIGINT) AS rank
      |FROM wins w JOIN p$rounds p ON p.i = w.i JOIN dd ON dd.i = w.i
      |ORDER BY item""".stripMargin
  }
}

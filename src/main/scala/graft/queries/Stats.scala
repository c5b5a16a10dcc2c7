package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distribution statistics & drift detection — the validation layer a
  * training-data pipeline runs BEFORE mixing sources: independence
  * tests over categorical metadata, two-sample drift tests over
  * numeric columns, digit-distribution audits, divergence of each
  * source's token distribution from the corpus, and lagged
  * cross-correlation between event streams. The reference connector
  * ships rows (`go-pq-cdc-kafka`'s pipeline has no analytic surface);
  * these are the checks its downstream consumers would run on the
  * replicated tables, executed here as first-class distributed
  * operators.
  *
  * Determinism discipline (the q134/q128 convention): every input to a
  * statistic is an exact integer aggregate; the statistic is ONE
  * fixed-shape double expression whose textual form mirrors the oracle
  * SQL exactly. Where a float-sum's partition order or a libm `ln`/
  * `log10` 1-ULP divergence could move the low bits (chi2, KL — sums
  * of many double terms), the result is PRESENTED in single precision:
  * the ≲1e-11 relative drift is far below float's 6e-8 ULP. Where
  * every candidate value is a closed-form function of exact integers
  * (KS max, correlation), the double is bit-identical by construction
  * and stays double.
  */
object Stats {

  /** q143: chi-square test of independence over the lang × source
    * contingency table of `documents` — "is language balance uniform
    * across sources?", the first mixture-health check. The only
    * corpus-sized shuffle is the cell aggregation (map-side partial);
    * margins, the |L|·|S| grid, and the statistic all live on the
    * bounded cell frame. Zero cells still contribute their expected
    * mass: the grid is the full margin cross-product, not just the
    * observed cells.
    */
  def q143Chi2Indep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = Tables.load(s, dir, "documents")
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy($"lang").agg(sum($"o").as("rl"))
    val colT = obs.groupBy($"source").agg(sum($"o").as("cl"))
    val tot = obs.agg(sum($"o").as("n_docs"))
    // full grid: every (lang, source) with both margins, observed or not
    val grid = rowT.crossJoin(colT).join(obs, Seq("lang", "source"), "left")
      .crossJoin(broadcast(tot))
      .select($"n_docs", $"rl", $"cl", coalesce($"o", lit(0L)).as("o"),
        // rl·cl would overflow long at corpus scale; go double first
        ($"rl".cast("double") * $"cl" / $"n_docs").as("e"))
    grid.agg(
      first($"n_docs").as("n_docs"),
      count(lit(1)).as("n_cells"),
      sum(($"o" - $"e") * ($"o" - $"e") / $"e").as("chi2_d"))
      .crossJoin(broadcast(rowT.agg(count(lit(1)).as("n_langs"))))
      .crossJoin(broadcast(colT.agg(count(lit(1)).as("n_sources"))))
      .select($"n_docs", $"n_langs", $"n_sources", $"n_cells",
        (($"n_langs" - 1) * ($"n_sources" - 1)).as("dof"),
        $"chi2_d".cast("float").as("chi2"))
  }

  val q143Chi2IndepSql: String =
    """WITH obs AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rl FROM obs GROUP BY 1),
      |ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cl FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_docs FROM obs),
      |grid AS (
      |  SELECT n_docs, COALESCE(o, 0) AS o,
      |    CAST(rl AS DOUBLE) * cl / n_docs AS e
      |  FROM rt CROSS JOIN ct CROSS JOIN tot
      |  LEFT JOIN obs USING (lang, source))
      |SELECT
      |  (SELECT n_docs FROM tot) AS n_docs,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS n_langs,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_sources,
      |  CAST(COUNT(*) AS BIGINT) AS n_cells,
      |  ((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM ct) - 1) AS dof,
      |  CAST(SUM((o - e) * (o - e) / e) AS FLOAT) AS chi2
      |FROM grid""".stripMargin

  /** q144: two-sample Kolmogorov–Smirnov drift test — D = max over the
    * value axis of |F_A − F_B| between `o_totalprice` of URGENT orders
    * and all others (the "did this segment's distribution move?" check
    * run between snapshots). The ECDFs need a GLOBAL ordered cumsum
    * over distinct values; executed as the q122/q136 distributed prefix
    * sum — range-partition on value, per-partition running counts, a
    * ≤`parts`-row offset frame broadcast back — so no single-partition
    * window at any scale. Every D candidate is |ca/na − cb/nb| over
    * exact integers: three IEEE ops, bit-identical cross-engine, and
    * `max` of identical candidates is identical — the statistic stays
    * double. The 1.358·sqrt((na+nb)/(na·nb)) critical value is the
    * standard α=0.05 asymptote (Smirnov).
    */
  def q144KsDrift(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val tagged = Tables.load(s, dir, "orders")
      .select($"o_totalprice".as("v"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("a"))
    val perV = tagged.groupBy($"v").agg(
      sum($"a").as("ca"), (count(lit(1)) - sum($"a")).as("cb"))
    val (ranged, offsets) = Prefix.boundedPrefixW(perV, parts,
      Seq("offa" -> $"ca", "offb" -> $"cb"), $"v".asc)
    val byV = Window.partitionBy($"pid").orderBy($"v")
    // totals from the row frame directly — one scan-agg, not a second
    // pass over the distinct-value frame
    val tot = tagged.agg(sum($"a").as("na"),
      (count(lit(1)) - sum($"a")).as("nb"))
    ranged
      .withColumn("ra", sum($"ca").over(byV))
      .withColumn("rb", sum($"cb").over(byV))
      .join(broadcast(offsets), "pid")
      .crossJoin(broadcast(tot))
      .select($"na", $"nb",
        abs(($"ra" + $"offa").cast("double") / $"na" -
          ($"rb" + $"offb").cast("double") / $"nb").as("d"))
      .groupBy($"na", $"nb").agg(max($"d").as("ks_d"))
      .select($"na".as("n_a"), $"nb".as("n_b"), $"ks_d",
        (lit(1.358) * sqrt(($"na" + $"nb").cast("double") /
          ($"na".cast("double") * $"nb"))).as("ks_crit"))
      .withColumn("drifted", $"ks_d" > $"ks_crit")
  }

  val q144KsDriftSql: String =
    """WITH t AS (
      |  SELECT o_totalprice AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
      |  FROM orders),
      |pv AS (
      |  SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
      |    CAST(COUNT(*) - SUM(a) AS BIGINT) AS cb
      |  FROM t GROUP BY 1),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |               CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
      |e AS (
      |  SELECT na, nb,
      |    abs(CAST(SUM(ca) OVER w AS DOUBLE) / na -
      |        CAST(SUM(cb) OVER w AS DOUBLE) / nb) AS d
      |  FROM pv CROSS JOIN tot
      |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT na AS n_a, nb AS n_b, MAX(d) AS ks_d,
      |  1.358 * sqrt(CAST(na + nb AS DOUBLE) / (CAST(na AS DOUBLE) * nb)) AS ks_crit,
      |  MAX(d) > 1.358 * sqrt(CAST(na + nb AS DOUBLE) / (CAST(na AS DOUBLE) * nb))
      |    AS drifted
      |FROM e GROUP BY na, nb""".stripMargin

  /** q145: Benford leading-digit audit of `l_extendedprice` — the
    * classic synthetic-vs-organic numeric-column screen (fabricated or
    * mis-generated monetary columns fail it). The leading digit is
    * extracted in integer space (price → exact cents → first decimal
    * digit of the integer) so no engine's float→string formatting or
    * `log10`-near-a-power-of-10 boundary can flip a digit. One scan,
    * a 9-row frame after the partial agg; chi2 against the Benford
    * mass function via a full-frame window sum (float presentation —
    * `log10` is libm, 1 ULP across engines).
    */
  def q145Benford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val digits = Tables.load(s, dir, "lineitem")
      .select(substring(round($"l_extendedprice" * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("lead_digit"))
      .groupBy($"lead_digit").agg(count(lit(1)).as("n_obs"))
    val all = Window.partitionBy(lit(0))
    digits
      .withColumn("n_total", sum($"n_obs").over(all))
      .select($"lead_digit", $"n_obs",
        ($"n_obs".cast("double") / $"n_total").as("obs_p"),
        log(10.0, lit(1.0) + lit(1.0) / $"lead_digit".cast("double"))
          .as("bp"),
        $"n_total")
      .withColumn("chi2", sum(
        ($"n_obs" - $"n_total" * $"bp") * ($"n_obs" - $"n_total" * $"bp") /
          ($"n_total" * $"bp")).over(all).cast("float"))
      .select($"lead_digit", $"n_obs", $"obs_p",
        $"bp".cast("float").as("benford_p"), $"chi2")
      .orderBy($"lead_digit")
  }

  val q145BenfordSql: String =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INTEGER) AS lead_digit
      |  FROM lineitem),
      |g AS (SELECT lead_digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
      |w AS (
      |  SELECT lead_digit, n_obs,
      |    CAST(SUM(n_obs) OVER () AS BIGINT) AS n_total,
      |    log10(1.0 + 1.0 / CAST(lead_digit AS DOUBLE)) AS bp
      |  FROM g)
      |SELECT lead_digit, n_obs,
      |  CAST(n_obs AS DOUBLE) / n_total AS obs_p,
      |  CAST(bp AS FLOAT) AS benford_p,
      |  CAST(SUM((n_obs - n_total * bp) * (n_obs - n_total * bp)
      |    / (n_total * bp)) OVER () AS FLOAT) AS chi2
      |FROM w ORDER BY lead_digit""".stripMargin

  /** q146: per-source KL divergence from the corpus unigram
    * distribution — KL(P_src ‖ P_corpus) = Σ_w p·ln(p/q), the mixture
    * report that quantifies HOW different each source's token
    * distribution is (q138 says whether sources overlap; this says how
    * far each sits from the blend). Since every source word is in the
    * corpus by construction, q > 0 always and the sum is finite. The
    * two corpus-sized shuffles are the (source,w) and (w) aggregations;
    * the join is w-keyed on the vocabulary frame, margins broadcast.
    * Float presentation: a vocabulary-sized sum of libm-ln terms
    * (drift ≲1e-11 relative, q134's argument).
    */
  def q146KlSource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.load(s, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("w"))
    val perSW = words.groupBy($"source", $"w").agg(count(lit(1)).as("cs"))
    val perW = perSW.groupBy($"w").agg(sum($"cs").as("cw"))
    val srcTot = perSW.groupBy($"source").agg(sum($"cs").as("ns"))
    val corpTot = perW.agg(sum($"cw").as("m"))
    perSW
      .join(perW, "w")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpTot))
      .select($"source", $"ns",
        (($"cs".cast("double") / $"ns") *
          log(($"cs".cast("double") / $"ns") /
            ($"cw".cast("double") / $"m"))).as("t"))
      .groupBy($"source", $"ns")
      .agg(count(lit(1)).as("n_types"), sum($"t").as("kl_d"))
      .select($"source", $"n_types", $"ns".as("n_tokens"),
        $"kl_d".cast("float").as("kl"))
      .orderBy($"source")
  }

  val q146KlSourceSql: String =
    """WITH words AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cs
      |       FROM words GROUP BY 1, 2),
      |pw AS (SELECT w, CAST(SUM(cs) AS BIGINT) AS cw FROM sw GROUP BY 1),
      |st AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM sw GROUP BY 1),
      |ct AS (SELECT CAST(SUM(cw) AS BIGINT) AS m FROM pw)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types, ns AS n_tokens,
      |  CAST(SUM((CAST(cs AS DOUBLE) / ns)
      |    * ln((CAST(cs AS DOUBLE) / ns) / (CAST(cw AS DOUBLE) / m))) AS FLOAT)
      |    AS kl
      |FROM sw JOIN pw USING (w) JOIN st USING (source) CROSS JOIN ct
      |GROUP BY source, ns ORDER BY source""".stripMargin

  /** q147: lagged cross-correlation of two event streams — Pearson
    * r(click_t, purchase_{t+ℓ}) for ℓ = 0…7 days, the "does activity
    * lead conversions?" diagnostic. The corpus-sized work is ONE daily
    * aggregation; the lag join and the five regression sums live on
    * the bounded day frame (|days| rows ≤ thousands even at 100 TB of
    * events). All five sums are exact integer aggregates; the Pearson
    * formula is one fixed-shape double expression (products go through
    * double before combining — day-count × per-day-count² products
    * would overflow long at scale), so the result is bit-identical
    * cross-engine and stays double.
    */
  def q147Xcorr(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    import s.implicits._
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    val lags = s.range(0, maxLag + 1).select($"id".cast("int").as("lag"))
    val pairs = daily.as("t1").crossJoin(broadcast(lags))
      .join(daily.as("t2"), expr("t2.d = date_add(t1.d, lag)"))
      .select($"lag", $"t1.x".as("x"), $"t2.y".as("y"))
    pairs.groupBy($"lag").agg(
      count(lit(1)).as("n_days"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"lag", $"n_days",
        (($"n_days" * $"sxy".cast("double") -
          $"sx".cast("double") * $"sy") /
          sqrt(($"n_days" * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx") *
            ($"n_days" * $"syy".cast("double") -
              $"sy".cast("double") * $"sy"))).as("xcorr"))
      .orderBy($"lag")
  }

  /** q151: two-proportion z-test — the experimentation primitive
    * ("does variant B purchase more?") run directly on the event
    * stream. Variant assignment is the deterministic `user_id % 2`
    * split (the q39 stable-split idea without the hash — any stable
    * bucketing works); the measured proportion is purchase share per
    * EVENT, which stays in (0,1) at every scale (a per-user
    * "ever purchased" flag saturates to 1 once users average enough
    * events — the original formulation divided by zero at sf0.1).
    * One corpus-sized aggregation; the pooled-variance z statistic is
    * ONE fixed-shape double expression over four exact integers —
    * bit-identical cross-engine, stays double — and the all-or-none
    * degenerate pool (zero variance) yields NULL z via an identical
    * guard on both engines. |z| > 1.96 is the α=0.05 two-sided line.
    */
  def q151AbTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "events")
      .select(($"user_id" % 2).as("variant"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("p"))
      .agg(
        sum(when($"variant" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"variant" === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when($"variant" === 0, $"p").otherwise(0L)).as("conv_a"),
        sum(when($"variant" === 1, $"p").otherwise(0L)).as("conv_b"))
    val pool = $"conv_a" + $"conv_b"
    val z = (($"conv_a".cast("double") / $"n_a" -
      $"conv_b".cast("double") / $"n_b") /
      sqrt((pool.cast("double") / ($"n_a" + $"n_b")) *
        (lit(1.0) - pool.cast("double") / ($"n_a" + $"n_b")) *
        (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")))
    c.select($"n_a", $"n_b", $"conv_a", $"conv_b",
      ($"conv_a".cast("double") / $"n_a").as("rate_a"),
      ($"conv_b".cast("double") / $"n_b").as("rate_b"),
      when(pool > 0 && pool < $"n_a" + $"n_b", z).as("z"))
      .withColumn("significant",
        coalesce(abs($"z") > 1.96, lit(false)))
  }

  val q151AbTestSql: String =
    """WITH c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM events)
      |SELECT n_a, n_b, conv_a, conv_b,
      |  CAST(conv_a AS DOUBLE) / n_a AS rate_a,
      |  CAST(conv_b AS DOUBLE) / n_b AS rate_b,
      |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
      |    (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
      |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
      |      (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
      |      (1.0 / n_a + 1.0 / n_b)) END AS z,
      |  COALESCE(abs(CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
      |    (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
      |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
      |      (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
      |      (1.0 / n_a + 1.0 / n_b)) END) > 1.96, false) AS significant
      |FROM c""".stripMargin

  /** q152: Gini concentration of token mass across sources — the
    * one-number mixture-balance report (0 = perfectly even corpus,
    * →1 = one source is the corpus). Uses the standard rank formula
    * G = 2·Σᵢ i·cᵢ / (n·Σc) − (n+1)/n over ascending-sorted supplies;
    * Σ i·cᵢ is an exact integer aggregate (ranks live on the bounded
    * source frame), so G is one deterministic double expression.
    */
  def q152Gini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.load(s, dir, "documents")
      .select($"source", size(split($"text", " ")).cast("long").as("t"))
      .groupBy($"source").agg(sum($"t").as("c"))
    sup
      .withColumn("i", row_number().over(
        Window.orderBy($"c", $"source")).cast("long"))
      .agg(count(lit(1)).as("n_sources"), sum($"c").as("total_tokens"),
        sum($"i" * $"c").as("ic"))
      .select($"n_sources", $"total_tokens",
        ((lit(2.0) * $"ic") / ($"n_sources" * $"total_tokens").cast("double") -
          ($"n_sources" + 1).cast("double") / $"n_sources").as("gini"))
  }

  val q152GiniSql: String =
    """WITH sup AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS c
      |  FROM documents GROUP BY 1),
      |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS i
      |      FROM sup),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
      |             CAST(SUM(c) AS BIGINT) AS total_tokens,
      |             CAST(SUM(i * c) AS BIGINT) AS ic FROM r)
      |SELECT n_sources, total_tokens,
      |  (2.0 * ic) / CAST(n_sources * total_tokens AS DOUBLE) -
      |    CAST(n_sources + 1 AS DOUBLE) / n_sources AS gini
      |FROM a""".stripMargin

  /** q153: quantile normalization — map every source's `n_chars`
    * distribution onto the GLOBAL distribution (the cross-source
    * feature-alignment transform, e.g. Bolstad et al. 2003's
    * microarray recipe): a document at within-source rank fraction f
    * is assigned the globally interpolated f-quantile. Within-source
    * ranks are per-source windows (naturally partitioned); the global
    * sorted axis is the q122/q136 distributed rank (range partition +
    * broadcast count offsets); the two quantile endpoints come back
    * by rank-keyed equijoins. Determinism: ranks and values are exact
    * integers; the fractional position and the interpolation are ONE
    * fixed-shape double expression each, mirrored textually in the
    * oracle — floor(pos) lands on identical double bits on both
    * engines, so the chosen endpoints are identical by construction.
    */
  def q153QuantileNorm(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"n_chars")
    val bySrc = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
    val ranked = docs
      .withColumn("r", row_number().over(bySrc).cast("long"))
      .withColumn("ns", count(lit(1))
        .over(Window.partitionBy($"source")))
    val (gRanged, gOff) =
      Prefix.boundedPrefix(docs, parts, lit(1L), $"n_chars".asc, $"doc_id".asc)
    val global = gRanged
      .withColumn("grn", row_number().over(
        Window.partitionBy($"pid").orderBy($"n_chars", $"doc_id")))
      .join(broadcast(gOff), "pid")
      .select(($"grn" + $"off").as("g"), $"n_chars".as("v"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val positioned = ranked.crossJoin(broadcast(n))
      // f in [0,1]: min -> global min, max -> global max; singleton
      // sources pin to the median fraction
      .withColumn("f", when($"ns" === 1, lit(0.5))
        .otherwise(($"r" - 1).cast("double") / ($"ns" - 1)))
      .withColumn("pos", lit(1.0) + $"f" * ($"n_total" - 1))
      .withColumn("klo", floor($"pos").cast("long"))
      .withColumn("khi", least($"klo" + 1, $"n_total"))
    positioned
      .join(global.as("lo"), $"klo" === $"lo.g")
      .join(global.as("hi"), $"khi" === $"hi.g")
      .select($"doc_id", $"source", $"n_chars",
        ($"lo.v" + ($"pos" - $"klo") * ($"hi.v" - $"lo.v")).as("qnorm"))
      .orderBy($"doc_id")
  }

  val q153QuantileNormSql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
      |  FROM d),
      |g AS (
      |  SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS g,
      |    n_chars AS v
      |  FROM d),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d),
      |p AS (
      |  SELECT doc_id, source, n_chars,
      |    1.0 + (CASE WHEN ns = 1 THEN 0.5
      |      ELSE CAST(r - 1 AS DOUBLE) / (ns - 1) END) * (n_total - 1) AS pos
      |  FROM r CROSS JOIN n),
      |k AS (
      |  SELECT doc_id, source, n_chars, pos,
      |    CAST(floor(pos) AS BIGINT) AS klo,
      |    least(CAST(floor(pos) AS BIGINT) + 1,
      |      (SELECT n_total FROM n)) AS khi
      |  FROM p)
      |SELECT doc_id, source, n_chars,
      |  lo.v + (pos - klo) * (hi.v - lo.v) AS qnorm
      |FROM k JOIN g lo ON klo = lo.g JOIN g hi ON khi = hi.g
      |ORDER BY doc_id""".stripMargin

  /** q154: daily PSI drift report — the ORACLE-GATED batch twin of
    * `EventStreams.psiDrift`: score every day's `value` distribution
    * against the first week's (the reference period a monitor is
    * calibrated on) with the population stability index. Binning is
    * clamped floor arithmetic (identical IEEE ops both engines);
    * both sides are Laplace-smoothed so empty bins stay finite; the
    * ≤nBins-row reference broadcasts; the only corpus-sized work is
    * the (day, bin) aggregation. The per-day sum folds nBins
    * libm-`ln` terms → float presentation (the q134 argument).
    */
  def q154PsiDaily(s: SparkSession, dir: String,
      nBins: Int = 10, lo: Double = 0.0, hi: Double = 500.0): DataFrame = {
    import s.implicits._
    val binW = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col("value") - lit(lo)) / lit(binW)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
    val binned = Tables.load(s, dir, "events")
      .select(to_date($"ts").as("d"), bin.as("b"))
    val daily = binned.groupBy($"d", $"b").agg(count(lit(1)).as("c"))
    val dailyTot = daily.groupBy($"d").agg(sum($"c").as("n"))
    val ref = binned.filter(dayofmonth($"d") <= 7)
      .groupBy($"b").agg(count(lit(1)).as("rc"))
    val refTot = ref.agg(sum($"rc").as("rn"))
    // full (day x bin) grid so zero observed/reference bins still
    // contribute their smoothed mass
    val grid = dailyTot.crossJoin(broadcast(
        s.range(0, nBins).select($"id".cast("int").as("b"))))
      .join(daily, Seq("d", "b"), "left")
      .join(broadcast(ref), Seq("b"), "left")
      .crossJoin(broadcast(refTot))
      .select($"d", $"n",
        ((coalesce($"c", lit(0L)) + 1).cast("double") / ($"n" + nBins)).as("p"),
        ((coalesce($"rc", lit(0L)) + 1).cast("double") / ($"rn" + nBins)).as("q"))
    grid.groupBy($"d", $"n")
      .agg(sum(($"p" - $"q") * log($"p" / $"q")).as("psi_d"))
      .select($"d".as("day"), $"n", $"psi_d".cast("float").as("psi"))
      .withColumn("drifted", $"psi" > 0.2f)
      .orderBy($"day")
  }

  def q154PsiDailySql(nBins: Int = 10, lo: Double = 0.0, hi: Double = 500.0): String = {
    val binW = (hi - lo) / nBins
    s"""WITH binned AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(least(greatest(floor((value - $lo) / $binW), 0.0),
      |      ${nBins - 1}.0) AS INTEGER) AS b
      |  FROM events),
      |daily AS (SELECT d, b, CAST(COUNT(*) AS BIGINT) AS c
      |          FROM binned GROUP BY 1, 2),
      |dtot AS (SELECT d, CAST(SUM(c) AS BIGINT) AS n FROM daily GROUP BY 1),
      |ref AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rc FROM binned
      |        WHERE date_part('day', d) <= 7 GROUP BY 1),
      |rtot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rn FROM ref),
      |bins AS (SELECT CAST(unnest(range(0, $nBins)) AS INTEGER) AS b),
      |grid AS (
      |  SELECT dtot.d, dtot.n,
      |    CAST(COALESCE(c, 0) + 1 AS DOUBLE) / (n + $nBins) AS p,
      |    CAST(COALESCE(rc, 0) + 1 AS DOUBLE) / (rn + $nBins) AS q
      |  FROM dtot CROSS JOIN bins
      |  LEFT JOIN daily ON daily.d = dtot.d AND daily.b = bins.b
      |  LEFT JOIN ref ON ref.b = bins.b
      |  CROSS JOIN rtot)
      |SELECT d AS day, n,
      |  CAST(SUM((p - q) * ln(p / q)) AS FLOAT) AS psi,
      |  CAST(SUM((p - q) * ln(p / q)) AS FLOAT) > CAST(0.2 AS FLOAT) AS drifted
      |FROM grid GROUP BY d, n ORDER BY day""".stripMargin
  }

  /** q156: exact WEIGHTED percentiles — "the document length at which
    * the median TOKEN sits" (weight = token count, value = n_chars):
    * the size profile a packing/budget planner actually needs, where
    * q102/q128's unweighted percentiles answer a different question
    * (the median DOCUMENT). Lower-bound convention — smallest value
    * whose cumulative weight reaches q·W — which makes the whole
    * query INTEGER-EXACT: the threshold tests are cross-multiplied
    * (2·cum ≥ W, 10·cum ≥ 9·W), so there is not a single floating-
    * point operation anywhere. The cumulative weight rides the
    * q122/q136 distributed prefix pattern.
    */
  def q156WeightedPctl(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
      .select($"doc_id", $"n_chars".as("v"),
        size(split($"text", " ")).cast("long").as("w"))
    val (ranged, offsets) =
      Prefix.boundedPrefix(d, parts, $"w", $"v".asc, $"doc_id".asc)
    val tot = d.agg(count(lit(1)).as("n_docs"), sum($"w").as("total_w"))
    ranged
      .withColumn("run", sum($"w").over(
        Window.partitionBy($"pid").orderBy($"v", $"doc_id")))
      .join(broadcast(offsets), "pid")
      .crossJoin(broadcast(tot))
      .select($"n_docs", $"total_w", $"v", ($"run" + $"off").as("cum"))
      .groupBy($"n_docs", $"total_w")
      .agg(
        min(when(lit(2) * $"cum" >= $"total_w", $"v")).as("p50_weighted"),
        min(when(lit(10) * $"cum" >= lit(9) * $"total_w", $"v"))
          .as("p90_weighted"))
  }

  val q156WeightedPctlSql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars AS v,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |               CAST(SUM(w) AS BIGINT) AS total_w FROM d),
      |c AS (
      |  SELECT v, CAST(SUM(w) OVER (ORDER BY v, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM d)
      |SELECT n_docs, total_w,
      |  MIN(CASE WHEN 2 * cum >= total_w THEN v END) AS p50_weighted,
      |  MIN(CASE WHEN 10 * cum >= 9 * total_w THEN v END) AS p90_weighted
      |FROM c CROSS JOIN tot GROUP BY n_docs, total_w""".stripMargin

  val q147XcorrSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |lags AS (SELECT unnest(range(0, 8)) AS lag),
      |pairs AS (
      |  SELECT lag, t1.x AS x, t2.y AS y
      |  FROM daily t1 CROSS JOIN lags
      |  JOIN daily t2 ON t2.d = t1.d + CAST(lag AS INTEGER)),
      |sums AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM pairs GROUP BY 1)
      |SELECT CAST(lag AS INTEGER) AS lag, n_days,
      |  (n_days * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
      |  sqrt((n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
      |       (n_days * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) AS xcorr
      |FROM sums ORDER BY lag""".stripMargin

  /** q171: Wilson score confidence intervals — per market segment, the
    * 95% interval for the proportion of URGENT-priority orders. The
    * Wilson interval (Wilson 1927) is the binomial CI that behaves at
    * small n and extreme proportions where the naive Wald interval
    * collapses — the per-segment health-metric banding a dashboard
    * should ship. Inputs are two exact integers (x, n) per segment from
    * ONE fact-side aggregation (dimension broadcast); the interval is a
    * fixed-shape double chain over them, textually mirrored — the q53
    * convention — so lo/hi are bit-identical cross-engine.
    */
  def q171WilsonCi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderpriority")
    val c = Tables.load(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val agg = o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("x"))
    val z = lit(1.96)
    val phat = $"x".cast("double") / $"n"
    val denom = lit(1.0) + z * z / $"n"
    val center = (phat + z * z / (lit(2.0) * $"n")) / denom
    val half = z * sqrt(phat * (lit(1.0) - phat) / $"n" +
      z * z / (lit(4.0) * $"n" * $"n")) / denom
    agg.select($"c_mktsegment", $"n", $"x",
        phat.as("p_hat"), (center - half).as("lo"), (center + half).as("hi"))
      .orderBy($"c_mktsegment")
  }

  val q171WilsonCiSql: String =
    """WITH a AS (
      |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |SELECT c_mktsegment, n, x,
      |  CAST(x AS DOUBLE) / n AS p_hat,
      |  ((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n))
      |    / (1.0 + 1.96 * 1.96 / n))
      |  - (1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n)
      |      / n + 1.96 * 1.96 / (4.0 * n * n)) / (1.0 + 1.96 * 1.96 / n))
      |    AS lo,
      |  ((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n))
      |    / (1.0 + 1.96 * 1.96 / n))
      |  + (1.96 * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n)
      |      / n + 1.96 * 1.96 / (4.0 * n * n)) / (1.0 + 1.96 * 1.96 / n))
      |    AS hi
      |FROM a ORDER BY c_mktsegment""".stripMargin

  /** q175: mutual information / entropy decomposition of the
    * lang × source table — the information-theoretic companion to
    * q143's chi-square: H(lang), H(source), H(lang, source), the
    * mutual information I = H(L) + H(S) − H(L,S), and the normalized
    * NMI = I / max-entropy-side. Every probability is an exact-integer
    * cell count over the corpus total; each entropy is a sum of
    * `−p·ln p` terms over the BOUNDED margin/cell frames. The ln-sums
    * fold dozens of libm terms, so the entropies present as float
    * (the q134/q143 argument); cell aggregation is the one corpus-
    * sized shuffle.
    */
  def q175MutualInfo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = Tables.load(s, dir, "documents")
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
    val tot = obs.agg(sum($"o").as("n"))
    def entropy(c: Column): Column =
      sum(-(c.cast("double") / $"n") * log(c.cast("double") / $"n"))
    val hl = obs.groupBy($"lang").agg(sum($"o").as("cl"))
      .crossJoin(broadcast(tot)).agg(entropy($"cl").as("h_lang"))
    val hs = obs.groupBy($"source").agg(sum($"o").as("cs"))
      .crossJoin(broadcast(tot)).agg(entropy($"cs").as("h_source"))
    val hj = obs.crossJoin(broadcast(tot)).agg(entropy($"o").as("h_joint"))
    hl.crossJoin(broadcast(hs)).crossJoin(broadcast(hj))
      .select(
        $"h_lang".cast("float").as("h_lang"),
        $"h_source".cast("float").as("h_source"),
        $"h_joint".cast("float").as("h_joint"),
        ($"h_lang" + $"h_source" - $"h_joint").cast("float").as("mi"),
        (($"h_lang" + $"h_source" - $"h_joint") /
          greatest($"h_lang", $"h_source")).cast("float").as("nmi"))
  }

  val q175MutualInfoSql: String =
    """WITH obs AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
      |hl AS (
      |  SELECT SUM(-(CAST(cl AS DOUBLE) / n) * ln(CAST(cl AS DOUBLE) / n))
      |    AS h_lang
      |  FROM (SELECT lang, CAST(SUM(o) AS BIGINT) AS cl FROM obs GROUP BY 1)
      |  CROSS JOIN tot),
      |hs AS (
      |  SELECT SUM(-(CAST(cs AS DOUBLE) / n) * ln(CAST(cs AS DOUBLE) / n))
      |    AS h_source
      |  FROM (SELECT source, CAST(SUM(o) AS BIGINT) AS cs FROM obs GROUP BY 1)
      |  CROSS JOIN tot),
      |hj AS (
      |  SELECT SUM(-(CAST(o AS DOUBLE) / n) * ln(CAST(o AS DOUBLE) / n))
      |    AS h_joint
      |  FROM obs CROSS JOIN tot)
      |SELECT CAST(h_lang AS FLOAT) AS h_lang,
      |  CAST(h_source AS FLOAT) AS h_source,
      |  CAST(h_joint AS FLOAT) AS h_joint,
      |  CAST(h_lang + h_source - h_joint AS FLOAT) AS mi,
      |  CAST((h_lang + h_source - h_joint)
      |    / greatest(h_lang, h_source) AS FLOAT) AS nmi
      |FROM hl CROSS JOIN hs CROSS JOIN hj""".stripMargin

  /** The 3×3 determinant by cofactor expansion, as ONE text template
    * evaluated by BOTH engines (Spark parses it via `expr`, DuckDB in
    * the oracle SQL) — textual identity makes the double arithmetic
    * bit-identical by construction. Inputs are column names already
    * cast to double.
    */
  private def det3(
      a: String, b: String, c: String,
      d: String, e: String, f: String,
      g: String, h: String, i: String): String =
    s"($a) * (($e) * ($i) - ($f) * ($h)) - " +
      s"($b) * (($d) * ($i) - ($f) * ($g)) + " +
      s"($c) * (($d) * ($h) - ($e) * ($g))"

  /** q179: two-feature linear regression, closed form — fit
    * purchases ≈ b0 + b1·clicks + b2·views per user by solving the 3×3
    * normal equations with Cramer's rule: the multi-feature step up
    * from q134/q157's single-regressor fits, i.e. distributed model
    * TRAINING as one relational aggregate. Every matrix entry is an
    * exact BIGINT sum from one corpus aggregation (features and target
    * are integer event counts); the four determinants are the SAME
    * cofactor text template evaluated by both engines over
    * double-cast sums, so b0/b1/b2 are bit-identical. At 100 TB: one
    * user-keyed aggregation + one 9-sum reduce to a single row —
    * nothing else.
    */
  def q179OlsMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.load(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x1"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("x2"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
    val sums = perUser.agg(
      count(lit(1)).as("n"),
      sum($"x1").as("sx1"), sum($"x2").as("sx2"), sum($"y").as("sy"),
      sum($"x1" * $"x1").as("s11"), sum($"x1" * $"x2").as("s12"),
      sum($"x2" * $"x2").as("s22"),
      sum($"x1" * $"y").as("s1y"), sum($"x2" * $"y").as("s2y"))
    val (n, sx1, sx2, sy, s11, s12, s22, s1y, s2y) = (
      "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(s11 AS DOUBLE)", "CAST(s12 AS DOUBLE)",
      "CAST(s22 AS DOUBLE)", "CAST(s1y AS DOUBLE)", "CAST(s2y AS DOUBLE)")
    val dDet = det3(n, sx1, sx2, sx1, s11, s12, sx2, s12, s22)
    val d0 = det3(sy, sx1, sx2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, sx2, sx1, s1y, s12, sx2, s2y, s22)
    val d2 = det3(n, sx1, sy, sx1, s11, s1y, sx2, s12, s2y)
    sums.select($"n", $"sx1".as("sum_clicks"), $"sx2".as("sum_views"),
      $"sy".as("sum_purchases"),
      expr(s"($d0) / ($dDet)").as("b0"),
      expr(s"($d1) / ($dDet)").as("b1"),
      expr(s"($d2) / ($dDet)").as("b2"))
  }

  val q179OlsMultiSql: String = {
    val (n, sx1, sx2, sy, s11, s12, s22, s1y, s2y) = (
      "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(s11 AS DOUBLE)", "CAST(s12 AS DOUBLE)",
      "CAST(s22 AS DOUBLE)", "CAST(s1y AS DOUBLE)", "CAST(s2y AS DOUBLE)")
    val dDet = det3(n, sx1, sx2, sx1, s11, s12, sx2, s12, s22)
    val d0 = det3(sy, sx1, sx2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, sx2, sx1, s1y, s12, sx2, s2y, s22)
    val d2 = det3(n, sx1, sy, sx1, s11, s1y, sx2, s12, s2y)
    s"""WITH u AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x1,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x2,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
      |    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
      |    CAST(SUM(x2 * x2) AS BIGINT) AS s22,
      |    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
      |    CAST(SUM(x2 * y) AS BIGINT) AS s2y
      |  FROM u)
      |SELECT n, sx1 AS sum_clicks, sx2 AS sum_views, sy AS sum_purchases,
      |  ($d0) / ($dDet) AS b0,
      |  ($d1) / ($dDet) AS b1,
      |  ($d2) / ($dDet) AS b2
      |FROM s""".stripMargin
  }

  /** q172: Mann–Whitney U rank-sum test — the nonparametric "did this
    * segment's distribution move?" twin of q144's KS: URGENT orders'
    * totalprice vs the rest, with exact mid-rank tie handling and the
    * tie-corrected normal approximation. The entire rank machinery
    * stays in integers: per distinct value, the tie group's doubled
    * rank-sum contribution is ca·(2r + t − 1) (mid-ranks are
    * half-integers, so DOUBLED rank sums are exact BIGINTs), with the
    * start rank r from the q144 distributed range-partitioned prefix —
    * no single-partition window at any scale. U, its mean, the
    * tie-corrected variance, and z are then single fixed-shape double
    * expressions over five exact integers, bit-identical cross-engine.
    */
  def q172MannWhitney(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val tagged = Tables.load(s, dir, "orders")
      .select($"o_totalprice".as("v"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("a"))
    val perV = tagged.groupBy($"v").agg(
      sum($"a").as("ca"), (count(lit(1)) - sum($"a")).as("cb"))
    val (ranged, offsets) =
      Prefix.boundedPrefix(perV, parts, $"ca" + $"cb", $"v".asc)
    val byV = Window.partitionBy($"pid").orderBy($"v")
    val withRank = ranged
      .withColumn("cumt", sum($"ca" + $"cb").over(byV))
      .join(broadcast(offsets), "pid")
      // start rank of the tie group at v: everything strictly before + 1
      .withColumn("r", $"off" + $"cumt" - ($"ca" + $"cb") + 1)
      .withColumn("t", $"ca" + $"cb")
    val sums = withRank.agg(
      sum($"ca").as("na"), sum($"cb").as("nb"),
      sum($"ca" * (lit(2L) * $"r" + $"t" - 1)).as("two_ra"),
      sum($"t" * $"t" * $"t" - $"t").as("tsum"))
    sums.select(
        $"na", $"nb",
        (($"two_ra" - $"na" * ($"na" + 1)).cast("double") / 2).as("u"),
        ((($"two_ra" - $"na" * ($"na" + 1)).cast("double") / 2
          - $"na".cast("double") * $"nb" / 2)
          / sqrt(($"na".cast("double") * $"nb" / 12) *
            (($"na" + $"nb" + 1)
              - $"tsum".cast("double")
                / (($"na" + $"nb") * ($"na" + $"nb" - 1))))).as("z"))
  }

  val q172MannWhitneySql: String =
    """WITH t AS (
      |  SELECT o_totalprice AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
      |  FROM orders),
      |pv AS (
      |  SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
      |    CAST(COUNT(*) - SUM(a) AS BIGINT) AS cb
      |  FROM t GROUP BY v),
      |rk AS (
      |  SELECT v, ca, cb, ca + cb AS t,
      |    CAST(COALESCE(SUM(ca + cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
      |      AS BIGINT) AS r
      |  FROM pv),
      |s AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
      |    CAST(SUM(ca * (2 * r + t - 1)) AS BIGINT) AS two_ra,
      |    CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
      |  FROM rk)
      |SELECT na, nb,
      |  CAST(two_ra - na * (na + 1) AS DOUBLE) / 2 AS u,
      |  (CAST(two_ra - na * (na + 1) AS DOUBLE) / 2
      |    - CAST(na AS DOUBLE) * nb / 2)
      |  / sqrt((CAST(na AS DOUBLE) * nb / 12) *
      |      ((na + nb + 1) - CAST(tsum AS DOUBLE)
      |        / ((na + nb) * (na + nb - 1)))) AS z
      |FROM s""".stripMargin

  /** q202: the Lorenz curve behind q152's Gini scalar — 20 ventile
    * points of (population share, cumulative revenue share) over
    * per-customer revenue, the curve an allocation/fairness report
    * actually plots. Revenue lifts to exact integer cents (the q165
    * discipline); the rank and the cumulative-revenue prefix ride ONE
    * range-partitioned pid window with broadcast offsets (the
    * q122/q144/q156 contract — no global window); the 20 boundary
    * ranks come from a 20-row broadcast frame joined back by equality.
    * Shares are single final double divisions of exact BIGINTs.
    */
  def q202Lorenz(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val rev = Tables.load(s, dir, "orders")
      .select($"o_custkey", round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"o_custkey").agg(sum($"cents").as("rev"))
    val (ranged, offsets) = Prefix.boundedPrefixW(rev, parts,
      Seq("offn" -> lit(1L), "offr" -> $"rev"), $"rev".asc, $"o_custkey".asc)
    val tot = rev.agg(count(lit(1)).as("n_cust"), sum($"rev").as("total_rev"))
    val byV = Window.partitionBy($"pid").orderBy($"rev", $"o_custkey")
    val ranked = ranged
      .withColumn("rn", count(lit(1)).over(byV))
      .withColumn("cr", sum($"rev").over(byV))
      .join(broadcast(offsets), "pid")
      .select(($"rn" + $"offn").as("rk"), ($"cr" + $"offr").as("cumrev"))
    val bounds = tot
      .select(explode(sequence(lit(1), lit(20))).as("ventile"),
        $"n_cust", $"total_rev")
      .select($"ventile", floor($"ventile" * $"n_cust" / lit(20)).as("rk"),
        $"n_cust", $"total_rev")
    ranked.join(broadcast(bounds), "rk")
      // long ventile: DuckDB's range() yields BIGINT and the gate
      // compares dtypes
      .select($"ventile".cast("long").as("ventile"),
        ($"rk".cast("double") / $"n_cust").as("pop_share"),
        ($"cumrev".cast("double") / $"total_rev").as("rev_share"))
      .orderBy($"ventile")
  }

  /** q205: Welch's unequal-variance t-test — the parametric partner of
    * q172's Mann–Whitney (rank test): do urgent orders carry a
    * different mean value than the rest? Everything reduces to six
    * exact integers (n, Σx, Σx² per group, in integer cents), then
    * mean/variance/t/df are ONE fixed-shape double expression each
    * (the q53 discipline: never a built-in variance-of-double whose
    * accumulation order floats). Σx² of cents stays under 2^62 at any
    * realistic sf; the Σx² − (Σx)²/n form evaluates (Σx)² in DOUBLE
    * because the integer square would overflow first. One map-side
    * aggregate; the statistic lives on a 1-row frame.
    */
  def q205WelchT(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vd = Exact.d2($"o_totalprice")
    val t = Tables.load(s, dir, "orders")
      .select(vd.as("v"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("a"))
    // DECIMAL sums (exact, associative — the q85 recipe: BIGINT cents
    // squared would overflow Σx²), one double cast per statistic
    val sums = t.agg(
      sum($"a").as("na"), (count(lit(1)) - sum($"a")).as("nb"),
      sum(when($"a" === 1L, $"v")).as("sa"),
      sum(when($"a" === 0L, $"v")).as("sb"),
      sum(when($"a" === 1L, $"v" * $"v")).as("qa"),
      sum(when($"a" === 0L, $"v" * $"v")).as("qb"))
    val ma = $"sa".cast("double") / $"na"
    val mb = $"sb".cast("double") / $"nb"
    val va = ($"qa".cast("double")
      - $"sa".cast("double") * $"sa".cast("double") / $"na") / ($"na" - 1)
    val vb = ($"qb".cast("double")
      - $"sb".cast("double") * $"sb".cast("double") / $"nb") / ($"nb" - 1)
    sums.select($"na", $"nb",
        ma.as("mean_a"), mb.as("mean_b"), va.as("var_a"), vb.as("var_b"))
      // t/df present in single precision: the wide-decimal Σx² → double
      // casts diverge in the last ulp across engines (the q165 rule);
      // the means are exact doubles (Σx stays under 2^53 cents)
      .select($"na", $"nb", $"mean_a", $"mean_b",
        (($"mean_a" - $"mean_b")
          / sqrt($"var_a" / $"na" + $"var_b" / $"nb")).cast("float").as("t"),
        ((($"var_a" / $"na" + $"var_b" / $"nb")
            * ($"var_a" / $"na" + $"var_b" / $"nb"))
          / (($"var_a" / $"na") * ($"var_a" / $"na") / ($"na" - 1)
            + ($"var_b" / $"nb") * ($"var_b" / $"nb") / ($"nb" - 1)))
          .cast("float").as("df"))
  }

  val q205WelchTSql: String =
    s"""WITH t AS (
      |  SELECT ${Exact.sqlD2("o_totalprice")} AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
      |  FROM orders),
      |s AS (
      |  SELECT CAST(SUM(a) AS BIGINT) AS na,
      |    CAST(COUNT(*) - SUM(a) AS BIGINT) AS nb,
      |    SUM(CASE WHEN a = 1 THEN v END) AS sa,
      |    SUM(CASE WHEN a = 0 THEN v END) AS sb,
      |    SUM(CASE WHEN a = 1 THEN v * v END) AS qa,
      |    SUM(CASE WHEN a = 0 THEN v * v END) AS qb
      |  FROM t),
      |m AS (
      |  SELECT na, nb,
      |    CAST(sa AS DOUBLE) / na AS mean_a,
      |    CAST(sb AS DOUBLE) / nb AS mean_b,
      |    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1) AS var_a,
      |    (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1) AS var_b
      |  FROM s)
      |SELECT na, nb, mean_a, mean_b,
      |  CAST((mean_a - mean_b) / sqrt(var_a / na + var_b / nb) AS FLOAT) AS t,
      |  CAST(((var_a / na + var_b / nb) * (var_a / na + var_b / nb))
      |    / ((var_a / na) * (var_a / na) / (na - 1)
      |      + (var_b / nb) * (var_b / nb) / (nb - 1)) AS FLOAT) AS df
      |FROM m""".stripMargin

  /** q207: two-sided 5% trimmed mean of order value — the robust
    * location estimate q128's winsorization (clamp) sits next to: here
    * the tails are DROPPED, not clamped. Ranks are unique (value,
    * orderkey) row ranks from the established range-partitioned pid
    * prefix (no global window); the trim cut `rank > floor(0.05·N) AND
    * rank ≤ N − floor(0.05·N)` is exact integer arithmetic; kept
    * values sum in exact decimal and divide once.
    */
  def q207TrimmedMean(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "orders")
      .select($"o_orderkey", Exact.d2($"o_totalprice").as("v"))
    val (ranged, offsets) = Prefix.boundedPrefixW(d, parts,
      Seq("offn" -> lit(1L)), $"v".asc, $"o_orderkey".asc)
    val tot = d.agg(count(lit(1)).as("n_total"), sum($"v").as("sv"))
    val byV = Window.partitionBy($"pid").orderBy($"v", $"o_orderkey")
    ranged
      .withColumn("rk", count(lit(1)).over(byV))
      .join(broadcast(offsets), "pid")
      .crossJoin(broadcast(tot))
      .withColumn("r", $"rk" + $"offn")
      .withColumn("cut", floor($"n_total" * lit(5) / lit(100)))
      .filter($"r" > $"cut" && $"r" <= $"n_total" - $"cut")
      .groupBy($"n_total", $"sv")
      .agg(count(lit(1)).as("n_kept"), sum($"v").as("skept"))
      .select($"n_total", $"n_kept",
        ($"sv".cast("double") / $"n_total").as("raw_mean"),
        ($"skept".cast("double") / $"n_kept").as("trimmed_mean"))
  }

  val q207TrimmedMeanSql: String =
    s"""WITH d AS (
      |  SELECT o_orderkey, ${Exact.sqlD2("o_totalprice")} AS v FROM orders),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total, SUM(v) AS sv FROM d),
      |rk AS (
      |  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, o_orderkey) AS BIGINT) AS r
      |  FROM d),
      |kept AS (
      |  SELECT n_total, sv, CAST(COUNT(*) AS BIGINT) AS n_kept, SUM(v) AS skept
      |  FROM rk CROSS JOIN tot
      |  WHERE r > CAST(FLOOR(n_total * 5 / 100) AS BIGINT)
      |    AND r <= n_total - CAST(FLOOR(n_total * 5 / 100) AS BIGINT)
      |  GROUP BY 1, 2)
      |SELECT n_total, n_kept,
      |  CAST(sv AS DOUBLE) / n_total AS raw_mean,
      |  CAST(skept AS DOUBLE) / n_kept AS trimmed_mean
      |FROM kept""".stripMargin

  /** q208: correlation matrix of the per-type daily activity series —
    * "which event streams move together day to day?" (q147 computes
    * one LAGGED pair; this is the full simultaneous matrix). Daily
    * counts are exact integers; each pair's five sums are exact
    * BIGINTs off a day-keyed self-join (t1 < t2 halves the matrix);
    * Pearson r is one fixed-shape double per pair on the bounded
    * pair frame. Degenerate (constant) series CASE-guard the zero
    * denominator.
    */
  def q208CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.load(s, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val a = daily.select($"event_type".as("t1"), $"day", $"n".as("x"))
    val b = daily.select($"event_type".as("t2"), $"day", $"n".as("y"))
    val den = (($"nd" * $"sxx" - $"sx" * $"sx").cast("double")
      * ($"nd" * $"syy" - $"sy" * $"sy"))
    a.join(b, Seq("day")).filter($"t1" < $"t2")
      .groupBy($"t1", $"t2")
      .agg(count(lit(1)).as("nd"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"t1", $"t2", $"nd",
        when(den =!= 0.0,
          ($"nd" * $"sxy" - $"sx" * $"sy").cast("double") / sqrt(den))
          .as("corr"))
      .orderBy($"t1", $"t2")
  }

  val q208CorrMatrixSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type AS t1, b.event_type AS t2,
      |    CAST(COUNT(*) AS BIGINT) AS nd,
      |    CAST(SUM(a.n) AS BIGINT) AS sx, CAST(SUM(b.n) AS BIGINT) AS sy,
      |    CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
      |    CAST(SUM(a.n * a.n) AS BIGINT) AS sxx,
      |    CAST(SUM(b.n * b.n) AS BIGINT) AS syy
      |  FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT t1, t2, nd,
      |  CASE WHEN CAST(nd * sxx - sx * sx AS DOUBLE) * (nd * syy - sy * sy) <> 0.0
      |       THEN CAST(nd * sxy - sx * sy AS DOUBLE)
      |            / sqrt(CAST(nd * sxx - sx * sx AS DOUBLE) * (nd * syy - sy * sy))
      |  END AS corr
      |FROM p ORDER BY t1, t2""".stripMargin

  /** q214: join-key skew report — the diagnosis that decides whether a
    * join needs the q67 salting treatment: the top-10 heaviest
    * lineitem→orders join keys with their share of all rows, plus the
    * corpus-level concentration summary (distinct keys, max/mean
    * multiplicity, heavy-hitter mass). One key-count aggregate; the
    * top-10 is a TakeOrderedAndProject merge; shares are single double
    * divisions of exact integers broadcast from a 1-row totals frame.
    */
  def q214SkewReport(s: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    import s.implicits._
    val counts = Tables.load(s, dir, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("c"))
    val tot = counts.agg(count(lit(1)).as("n_keys"), sum($"c").as("n_rows"))
    counts.crossJoin(broadcast(tot))
      .orderBy($"c".desc, $"l_orderkey")
      .limit(topK)
      .select($"l_orderkey", $"c".as("multiplicity"), $"n_keys", $"n_rows",
        ($"c".cast("double") / $"n_rows").as("row_share"),
        ($"c".cast("double") * $"n_keys" / $"n_rows").as("vs_mean"))
      .orderBy($"multiplicity".desc, $"l_orderkey")
  }

  val q214SkewReportSql: String =
    """WITH counts AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |               CAST(SUM(c) AS BIGINT) AS n_rows FROM counts)
      |SELECT l_orderkey, c AS multiplicity, n_keys, n_rows,
      |  CAST(c AS DOUBLE) / n_rows AS row_share,
      |  CAST(c AS DOUBLE) * n_keys / n_rows AS vs_mean
      |FROM counts CROSS JOIN tot
      |ORDER BY multiplicity DESC, l_orderkey LIMIT 10""".stripMargin

  val q202LorenzSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
      |               CAST(SUM(rev) AS BIGINT) AS total_rev FROM rev),
      |c AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS rk,
      |    CAST(SUM(rev) OVER (ORDER BY rev, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumrev
      |  FROM rev),
      |b AS (
      |  SELECT q AS ventile, CAST(FLOOR(q * n_cust / 20) AS BIGINT) AS rk,
      |    n_cust, total_rev
      |  FROM range(1, 21) t(q) CROSS JOIN tot)
      |SELECT ventile, CAST(c.rk AS DOUBLE) / n_cust AS pop_share,
      |  CAST(cumrev AS DOUBLE) / total_rev AS rev_share
      |FROM c JOIN b USING (rk)
      |ORDER BY ventile""".stripMargin

  /** q237: split-conformal prediction intervals (Vovk et al.; the
    * Lei et al. 2018 split-conformal recipe) around the q179 linear
    * model — the distribution-free guarantee a point-predicting
    * regression owes its consumers: train on one fold, take the
    * ⌈(1−α)(n+1)⌉-th smallest absolute calibration residual as the
    * interval half-width q̂, and report the realized coverage of
    * ŷ ± q̂ on a held-out test fold (finite-sample ≥ 1−α under
    * exchangeability, no normality assumption — what q179's plain fit
    * cannot promise). Users split 6/2/2 by the q39 portable md5
    * bucket.
    *
    * Cross-engine exactness: features/targets are integer counts, the
    * normal-equation sums are exact BIGINTs over the train fold only,
    * the coefficients are the SAME det3 cofactor text template both
    * engines evaluate, residuals are one fixed-shape double chain, and
    * q̂ is an ORDER STATISTIC — selected by exact (resid, user_id)
    * rank, never an interpolating quantile — so the coverage compare
    * `resid ≤ q̂` sees identical bits on both engines. k comes from
    * FLOOR arithmetic on BIGINTs (identical IEEE ops).
    *
    * Scale shape: one user-keyed aggregate over events, a 9-sum
    * one-row reduce on the train fold, and the q172/q194
    * range-partitioned distributed prefix for the calibration rank —
    * no global single-partition window; q̂ and the coefficients ride
    * broadcast one-row frames onto the test fold.
    */
  def q237Conformal(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val bucket = (conv(substring(md5(concat(lit("conf:"), $"user_id".cast("string"))), 1, 8),
      16, 10).cast("long") % 10).as("bucket")
    val perUser = Tables.load(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x1"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("x2"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      .select($"*", bucket)
      .localCheckpoint(true) // three folds read this frame
    val train = perUser.filter($"bucket" < 6)
    val fitSums = train.agg(
      count(lit(1)).as("n"),
      sum($"x1").as("sx1"), sum($"x2").as("sx2"), sum($"y").as("sy"),
      sum($"x1" * $"x1").as("s11"), sum($"x1" * $"x2").as("s12"),
      sum($"x2" * $"x2").as("s22"),
      sum($"x1" * $"y").as("s1y"), sum($"x2" * $"y").as("s2y"))
    val (n, sx1, sx2, sy, s11, s12, s22, s1y, s2y) = (
      "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(s11 AS DOUBLE)", "CAST(s12 AS DOUBLE)",
      "CAST(s22 AS DOUBLE)", "CAST(s1y AS DOUBLE)", "CAST(s2y AS DOUBLE)")
    val dDet = det3(n, sx1, sx2, sx1, s11, s12, sx2, s12, s22)
    val d0 = det3(sy, sx1, sx2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, sx2, sx1, s1y, s12, sx2, s2y, s22)
    val d2 = det3(n, sx1, sy, sx1, s11, s1y, sx2, s12, s2y)
    val fit = fitSums.select($"n".as("n_train"),
      expr(s"($d0) / ($dDet)").as("b0"),
      expr(s"($d1) / ($dDet)").as("b1"),
      expr(s"($d2) / ($dDet)").as("b2"))
    def resid(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(fit))
      .withColumn("resid", abs($"y".cast("double") -
        ($"b0" + $"b1" * $"x1".cast("double") + $"b2" * $"x2".cast("double"))))
    val cal = resid(perUser.filter($"bucket" >= 6 && $"bucket" < 8))
      .select($"user_id", $"resid")
    // exact k-th order statistic via the distributed range-partitioned prefix
    val (ranged, offsets) =
      Prefix.boundedPrefix(cal, parts, lit(1L), $"resid".asc, $"user_id".asc)
    val wIn = Window.partitionBy($"pid").orderBy($"resid", $"user_id")
    val rankedCal = ranged.join(broadcast(offsets), "pid")
      .withColumn("rk", $"off" + row_number().over(wIn))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // ⌈(1−α)(n+1)⌉ exceeds n when n_cal < ⌈(1−α)/α⌉ — the guarantee
    // then needs an infinite interval; report the conventional finite
    // clamp (q̂ = max residual) instead, documented, both engines
    val kSel = nCal.select($"n_cal",
      least(floor((lit(9L) * ($"n_cal" + 1) + 9L) / lit(10.0)), $"n_cal").as("k"))
    val qhat = rankedCal.crossJoin(broadcast(kSel))
      .filter($"rk" === $"k")
      .select($"n_cal", $"k", $"resid".as("qhat"))
    val test = resid(perUser.filter($"bucket" >= 8))
    // grouped (not global) aggregate: an empty calibration fold yields
    // ZERO rows on both engines, not a Spark-only all-null row
    test.crossJoin(broadcast(qhat))
      .groupBy($"n_train", $"n_cal", $"k", $"b0", $"b1", $"b2", $"qhat")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"resid" <= $"qhat", 1L).otherwise(0L)).as("n_covered"))
      .select($"n_train", $"n_cal", $"k", $"n_test", $"n_covered",
        $"b0".cast("float").as("b0"), $"b1".cast("float").as("b1"),
        $"b2".cast("float").as("b2"),
        $"qhat".cast("float").as("qhat"),
        ($"n_covered".cast("double") / $"n_test".cast("double"))
          .cast("float").as("coverage"))
  }

  val q237ConformalSql: String = {
    val (n, sx1, sx2, sy, s11, s12, s22, s1y, s2y) = (
      "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(s11 AS DOUBLE)", "CAST(s12 AS DOUBLE)",
      "CAST(s22 AS DOUBLE)", "CAST(s1y AS DOUBLE)", "CAST(s2y AS DOUBLE)")
    val dDet = det3(n, sx1, sx2, sx1, s11, s12, sx2, s12, s22)
    val d0 = det3(sy, sx1, sx2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, sx2, sx1, s1y, s12, sx2, s2y, s22)
    val d2 = det3(n, sx1, sy, sx1, s11, s1y, sx2, s12, s2y)
    s"""WITH u AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x2,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CAST(('0x' || substring(md5('conf:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10
      |      AS bucket
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
      |    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
      |    CAST(SUM(x2 * x2) AS BIGINT) AS s22,
      |    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
      |    CAST(SUM(x2 * y) AS BIGINT) AS s2y
      |  FROM u WHERE bucket < 6),
      |fit AS (
      |  SELECT n AS n_train,
      |    ($d0) / ($dDet) AS b0,
      |    ($d1) / ($dDet) AS b1,
      |    ($d2) / ($dDet) AS b2
      |  FROM s),
      |cal AS (
      |  SELECT u.user_id,
      |    abs(CAST(u.y AS DOUBLE) - (f.b0 + f.b1 * CAST(u.x1 AS DOUBLE)
      |      + f.b2 * CAST(u.x2 AS DOUBLE))) AS resid
      |  FROM u CROSS JOIN fit f WHERE u.bucket >= 6 AND u.bucket < 8),
      |ksel AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
      |    LEAST(CAST(FLOOR((9 * (COUNT(*) + 1) + 9) / 10.0) AS BIGINT),
      |          CAST(COUNT(*) AS BIGINT)) AS k
      |  FROM cal),
      |qh AS (
      |  SELECT k1.n_cal, k1.k, r.resid AS qhat
      |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY resid, user_id) AS rk FROM cal) r
      |  JOIN ksel k1 ON r.rk = k1.k),
      |te AS (
      |  SELECT u.user_id,
      |    abs(CAST(u.y AS DOUBLE) - (f.b0 + f.b1 * CAST(u.x1 AS DOUBLE)
      |      + f.b2 * CAST(u.x2 AS DOUBLE))) AS resid
      |  FROM u CROSS JOIN fit f WHERE u.bucket >= 8)
      |SELECT f.n_train, q.n_cal, q.k,
      |  CAST(COUNT(*) AS BIGINT) AS n_test,
      |  CAST(SUM(CASE WHEN te.resid <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_covered,
      |  CAST(f.b0 AS FLOAT) AS b0, CAST(f.b1 AS FLOAT) AS b1,
      |  CAST(f.b2 AS FLOAT) AS b2, CAST(q.qhat AS FLOAT) AS qhat,
      |  CAST(CAST(SUM(CASE WHEN te.resid <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS FLOAT) AS coverage
      |FROM te CROSS JOIN qh q CROSS JOIN fit f
      |GROUP BY f.n_train, q.n_cal, q.k, f.b0, f.b1, f.b2, q.qhat""".stripMargin
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Model-evaluation & survival-analysis operators — the measurement
  * layer that closes the loop on the pipeline's own models: a
  * Kaplan–Meier estimator over censored durations (q193), ROC AUC via
  * the tie-corrected rank formula (q194), a calibration / reliability
  * report (q195), and held-out perplexity under the q104 bigram
  * language model (q196). The reference connector
  * (`go-pq-cdc-kafka`) ships rows; these are the evaluations its
  * downstream ML consumers run on the replicated data, expressed as
  * distributed Spark plans.
  *
  * Determinism discipline: every statistic's inputs are exact integer
  * aggregates (counts, doubled rank sums, µs differences) or
  * bit-identical float scores; sequential folds (the KM survival
  * product, per-position log-prob sums) run in an explicit key order
  * on BOUNDED frames so both engines execute the identical IEEE
  * sequence; `ln`/`exp` results are presented in single precision
  * (the q104 libm-ULP rule).
  */
object ModelEval {

  /** q193: Kaplan–Meier survival over the signup→first-purchase
    * activation lag (hours) with RIGHT CENSORING — the estimator
    * q183's plain percentiles cannot replace once non-converters
    * exist: a user who never purchased is not "missing", they are
    * censored at their last-seen time, and dropping them biases the
    * curve optimistic. Per user: signup time s, first purchase at or
    * after s (the event), last activity (the censoring time). The
    * (t, d, c) life table is one grouped aggregate; at-risk counts are
    * a cumulative sum over the BOUNDED distinct-lag frame (≤ the
    * corpus span in hours); and S(t) = Π(1 − d/n) folds factors in
    * ascending-t order — the q123 sequential-fold discipline, so the
    * product is bit-identical across engines and partitionings. At
    * 100 TB the only corpus-sized work is the two user-keyed
    * aggregates; everything after lives on the life-table frame.
    */
  def q193Survival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val pu = ev.groupBy($"user_id").agg(
        min(when($"event_type" === "signup", $"us")).as("s"),
        max($"us").as("lastus"))
      .filter($"s".isNotNull)
    // first purchase at-or-after signup: same-key join + conditional min
    val firstP = ev.filter($"event_type" === "purchase")
      .join(pu.select($"user_id", $"s"), "user_id")
      .filter($"us" >= $"s")
      .groupBy($"user_id").agg(min($"us").as("p"))
    val lab = pu.join(firstP, Seq("user_id"), "left")
      .select(
        // FLOOR, not a bare cast: DuckDB CAST(double AS BIGINT) rounds
        // while Spark's truncates — floor is identical in both
        floor((coalesce($"p", $"lastus") - $"s") / lit(3600000000L)).as("t"),
        when($"p".isNotNull, 1L).otherwise(0L).as("conv"))
    val grp = lab.groupBy($"t").agg(
      sum($"conv").as("d"),
      (count(lit(1)) - sum($"conv")).as("c"))
    val ntot = grp.agg(sum($"d" + $"c").as("n_total"))
    // bounded life-table frame: the partition-less window is over
    // ≤ span-in-hours rows (the q172 offsets precedent)
    val wcum = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lifeTable = grp.crossJoin(broadcast(ntot))
      .withColumn("at_risk",
        $"n_total" - coalesce(sum($"d" + $"c").over(wcum), lit(0L)))
      .withColumn("factor",
        lit(1.0) - $"d".cast("double") / $"at_risk")
    val ser = lifeTable.groupBy().agg(
      sort_array(collect_list(struct($"t", $"d", $"c", $"at_risk", $"factor")))
        .as("xs"))
    // the global collect_list aggregate always emits one row, so on a
    // corpus with zero signup users xs is [] — clamp the slice length
    // (size-1 would be -1, a runtime error) and drop the empty row so
    // the query returns zero rows instead of crashing
    val folded = aggregate(
      slice($"xs", lit(2), greatest(size($"xs") - 1, lit(0))),
      array(struct(
        element_at($"xs", 1).getField("t").as("t"),
        element_at($"xs", 1).getField("d").as("d"),
        element_at($"xs", 1).getField("c").as("c"),
        element_at($"xs", 1).getField("at_risk").as("at_risk"),
        element_at($"xs", 1).getField("factor").as("surv"))),
      (acc, x) => concat(acc, array(struct(
        x.getField("t").as("t"),
        x.getField("d").as("d"),
        x.getField("c").as("c"),
        x.getField("at_risk").as("at_risk"),
        (element_at(acc, size(acc)).getField("surv") * x.getField("factor"))
          .as("surv")))))
    ser.filter(size($"xs") >= 1).select(explode(folded).as("e"))
      .select($"e.t".as("t_hours"), $"e.at_risk".as("at_risk"),
        $"e.d".as("converted"), $"e.c".as("censored"),
        $"e.surv".as("survival"))
      .orderBy($"t_hours")
  }

  val q193SurvivalSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |pu AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN us END) AS s,
      |    max(us) AS lastus
      |  FROM ev GROUP BY 1),
      |pu2 AS (SELECT * FROM pu WHERE s IS NOT NULL),
      |fp AS (
      |  SELECT e.user_id, min(e.us) AS p
      |  FROM ev e JOIN pu2 p2 ON e.user_id = p2.user_id
      |  WHERE e.event_type = 'purchase' AND e.us >= p2.s
      |  GROUP BY 1),
      |lab AS (
      |  SELECT CAST(FLOOR((COALESCE(fp.p, p2.lastus) - p2.s) / 3600000000) AS BIGINT) AS t,
      |    CASE WHEN fp.p IS NOT NULL THEN 1 ELSE 0 END AS conv
      |  FROM pu2 p2 LEFT JOIN fp ON p2.user_id = fp.user_id),
      |g AS (
      |  SELECT t, CAST(SUM(conv) AS BIGINT) AS d,
      |    CAST(COUNT(*) - SUM(conv) AS BIGINT) AS c
      |  FROM lab GROUP BY 1),
      |nt AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n_total FROM g),
      |f AS (
      |  SELECT t, d, c,
      |    n_total - CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
      |  FROM g, nt),
      |f2 AS (
      |  SELECT *, CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / at_risk AS factor
      |  FROM f),
      |ser AS (
      |  SELECT list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
      |    list(c ORDER BY t) AS cs, list(at_risk ORDER BY t) AS ns,
      |    list(factor ORDER BY t) AS fs
      |  FROM f2),
      |ex AS (
      |  SELECT unnest(ts) AS t_hours, unnest(ns) AS at_risk,
      |    unnest(ds) AS converted, unnest(cs) AS censored,
      |    unnest(list_transform(range(1, len(fs) + 1),
      |      i -> list_reduce(fs[1:i], (a, x) -> a * x))) AS survival
      |  FROM ser)
      |SELECT t_hours, at_risk, converted, censored, survival
      |FROM ex ORDER BY t_hours""".stripMargin

  /** q194: ROC AUC of the q112 quality score against the `lang = 'en'`
    * label — the standard grade for a filtering model, computed EXACTLY
    * via the tie-corrected mid-rank identity
    * `AUC = (Σ_pos midrank − n₁(n₁+1)/2) / (n₁·n₀)` rather than a
    * trapezoid sweep. Scores collapse to per-value (ca, cb) counts
    * first (one aggregate), mid-ranks come from the q172
    * range-partitioned distributed prefix — no global window — and the
    * doubled rank sum keeps everything in exact BIGINTs until one final
    * fixed-shape double division. Gini = 2·AUC − 1 rides along.
    */
  def q194Auc(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import s.implicits._
    val tagged = LangModel.qualityScores(s, dir)
      .select($"quality_score".as("v"),
        when($"lang" === "en", 1L).otherwise(0L).as("a"))
    val perV = tagged.groupBy($"v").agg(
      sum($"a").as("ca"), (count(lit(1)) - sum($"a")).as("cb"))
    val (ranged, offsets) =
      Prefix.boundedPrefix(perV, parts, $"ca" + $"cb", $"v".asc)
    val byV = Window.partitionBy($"pid").orderBy($"v")
    val withRank = ranged
      .withColumn("cumt", sum($"ca" + $"cb").over(byV))
      .join(broadcast(offsets), "pid")
      .withColumn("r", $"off" + $"cumt" - ($"ca" + $"cb") + 1)
      .withColumn("t", $"ca" + $"cb")
    val sums = withRank.agg(
      sum($"ca").as("na"), sum($"cb").as("nb"),
      sum($"ca" * (lit(2L) * $"r" + $"t" - 1)).as("two_ra"))
    sums.select($"na", $"nb",
        (($"two_ra" - $"na" * ($"na" + 1)).cast("double") / 2
          / ($"na".cast("double") * $"nb")).as("auc"))
      .select($"na", $"nb", $"auc",
        (lit(2.0) * $"auc" - lit(1.0)).as("gini"))
  }

  val q194AucSql: String =
    s"""WITH ${LangModel.qualityScoresCte},
      |t AS (
      |  SELECT quality_score AS v,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
      |  FROM qscore),
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
      |    CAST(SUM(ca * (2 * r + t - 1)) AS BIGINT) AS two_ra
      |  FROM rk),
      |a AS (
      |  SELECT na, nb,
      |    CAST(two_ra - na * (na + 1) AS DOUBLE) / 2
      |      / (CAST(na AS DOUBLE) * nb) AS auc
      |  FROM s)
      |SELECT na, nb, auc,
      |  CAST(2.0 AS DOUBLE) * auc - CAST(1.0 AS DOUBLE) AS gini
      |FROM a""".stripMargin

  /** q195: calibration / reliability report for the q112 score — per
    * decile-of-predicted-probability: how many documents, how many
    * actually English, the mean predicted probability (confidence) and
    * the empirical rate (accuracy). The gap per bin is what an ECE
    * sums; emitting the bins keeps the report actionable. Counts are
    * exact integers; the float scores sum in doc_id order (the q104
    * ordered-fold discipline) so the bin means are bit-identical
    * across engines. One doc-keyed aggregate + one 10-row frame.
    */
  def q195Calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = LangModel.qualityScores(s, dir)
      .select($"doc_id", $"quality_score".cast("double").as("p"),
        when($"lang" === "en", 1L).otherwise(0L).as("y"))
      .withColumn("bin", least(floor($"p" * 10), lit(9L)))
    sc.groupBy($"bin").agg(
        count(lit(1)).as("n"),
        sum($"y").as("positives"),
        LangModel.orderedSum($"doc_id", $"p").as("sum_p"))
      .select($"bin", $"n", $"positives",
        ($"sum_p" / $"n").as("mean_pred"),
        ($"positives".cast("double") / $"n").as("emp_rate"))
      .orderBy($"bin")
  }

  val q195CalibrationSql: String =
    s"""WITH ${LangModel.qualityScoresCte},
      |sc AS (
      |  SELECT doc_id, CAST(quality_score AS DOUBLE) AS p,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM qscore),
      |b AS (
      |  SELECT *, LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin FROM sc),
      |g AS (
      |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS positives,
      |    list_sum(list(p ORDER BY doc_id)) AS sum_p
      |  FROM b GROUP BY bin)
      |SELECT bin, n, positives, sum_p / n AS mean_pred,
      |  CAST(positives AS DOUBLE) / n AS emp_rate
      |FROM g ORDER BY bin""".stripMargin

  /** q196: held-out perplexity — the q104 bigram model trained on the
    * 80% split (`doc_id % 5 ≠ 0`) and EVALUATED on the unseen 20%,
    * which is the measurement q104's self-scoring cannot give: a
    * language model's quality is its surprise on text it did not
    * train on. Add-one smoothing over the train vocabulary handles
    * unseen transitions ((0+1)/(c₁+V)) and unseen contexts ((0+1)/V)
    * through the same left-join + coalesce shape. Counts are exact;
    * per-document log-prob sums fold in position order; `ln`/`exp`
    * results present as float (the libm-ULP rule). At 100 TB: two
    * grouped counts over the train split, one broadcast scalar, and a
    * bigram-keyed join against the (pruned) model — the q59/q66
    * broadcast-model shape.
    */
  def q196Perplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", split($"text", " ").as("ws"))
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val test = docs.filter($"doc_id" % 5 === 0)
    val uni = train.select(explode($"ws").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c1"))
    val voc = uni.agg(count(lit(1)).as("v"))
    val big = train.select(explode(call_function("word_ngrams", $"text", lit(2))).as("b"))
      .groupBy($"b").agg(count(lit(1)).as("c2"))
    val terms = test
      .select($"doc_id",
        posexplode(call_function("word_ngrams", $"text", lit(2))).as(Seq("pos", "b")))
      .join(big, Seq("b"), "left")
      .withColumn("w1", split($"b", " ").getItem(0))
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(voc))
      .select($"doc_id", $"pos",
        log((coalesce($"c2", lit(0L)) + lit(1.0))
          / (coalesce($"c1", lit(0L)) + $"v")).as("t"))
    terms.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        LangModel.orderedSum($"pos", $"t").as("sum_lp"))
      .select($"doc_id", $"n_bigrams",
        ($"sum_lp" / $"n_bigrams").cast("float").as("avg_logprob"),
        exp(-($"sum_lp" / $"n_bigrams")).cast("float").as("perplexity"))
      .orderBy($"doc_id")
  }

  val q196PerplexitySql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tr AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
      |te AS (SELECT * FROM d WHERE doc_id % 5 = 0),
      |uni AS (SELECT w AS w1, CAST(COUNT(*) AS BIGINT) AS c1
      |        FROM (SELECT unnest(ws) AS w FROM tr) GROUP BY 1),
      |voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      |bg AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
      |         SELECT unnest(list_transform(range(1, len(ws)),
      |           i -> ws[i] || ' ' || ws[i+1])) AS b FROM tr) GROUP BY 1),
      |u AS (SELECT doc_id, unnest(bs) AS b, generate_subscripts(bs, 1) AS pos
      |      FROM (SELECT doc_id, list_transform(range(1, len(ws)),
      |              i -> ws[i] || ' ' || ws[i+1]) AS bs FROM te)),
      |t AS (SELECT u.doc_id, u.pos,
      |        ln((COALESCE(bg.c2, 0) + CAST(1.0 AS DOUBLE))
      |           / (COALESCE(uni.c1, 0) + voc.v)) AS t
      |      FROM u LEFT JOIN bg ON bg.b = u.b
      |        LEFT JOIN uni ON uni.w1 = string_split(u.b, ' ')[1]
      |        CROSS JOIN voc)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(list_sum(list(t ORDER BY pos)) / CAST(COUNT(*) AS BIGINT) AS FLOAT) AS avg_logprob,
      |  CAST(exp(-(list_sum(list(t ORDER BY pos)) / CAST(COUNT(*) AS BIGINT))) AS FLOAT) AS perplexity
      |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q234: group-fairness audit of the q112 quality filter — the
    * pre-deployment check a corpus-curation model owes its sources
    * (the public Fairlearn/Aequitas report card): per source group,
    * the selection rate (share of documents the filter keeps — whose
    * gap across groups is demographic parity), the true-positive and
    * false-positive rates against the `lang = 'en'` label (whose gaps
    * are equalized odds, Hardt et al. 2016), and each group's gap vs
    * the pooled overall rate. A filter with high AUC (q194) can still
    * starve one source of its good documents — this is the query that
    * shows it.
    *
    * Cross-engine exactness: the confusion cells are exact BIGINT sums
    * over {0,1} products; every rate is ONE fixed-shape double
    * division (guarded to NULL on an empty label class, the q226
    * degenerate-denominator rule) and gaps subtract the identically
    * shaped pooled rate before a single float presentation.
    *
    * Scale shape: the q112 feature aggregate is map-side partial on
    * doc_id, the source join is a doc_id-keyed equijoin, then ONE
    * source-keyed aggregate whose output is bounded by |sources|; the
    * pooled row re-aggregates that bounded frame and rides a broadcast
    * one-row crossJoin — no second corpus pass.
    */
  def q234FairnessAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = LangModel.qualityScores(s, dir)
      .join(Tables.load(s, dir, "documents").select($"doc_id", $"source"),
        Seq("doc_id"))
      .select($"source",
        when($"lang" === "en", 1L).otherwise(0L).as("y"),
        when($"quality_score" >= 0.5, 1L).otherwise(0L).as("pred"))
    val grp = scored.groupBy($"source").agg(
      count(lit(1)).as("n"),
      sum($"pred").as("n_kept"),
      sum($"pred" * $"y").as("tp"),
      sum($"pred" * (lit(1L) - $"y")).as("fp"),
      sum((lit(1L) - $"pred") * $"y").as("fn"),
      sum((lit(1L) - $"pred") * (lit(1L) - $"y")).as("tn"))
    val overall = grp.agg(
      sum($"n").as("o_n"), sum($"n_kept").as("o_kept"),
      sum($"tp").as("o_tp"), sum($"fp").as("o_fp"),
      sum($"fn").as("o_fn"), sum($"tn").as("o_tn"))
    def rate(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0L, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
    grp.crossJoin(broadcast(overall))
      .select($"source", $"n", $"n_kept", $"tp", $"fp", $"fn", $"tn",
        rate($"n_kept", $"n").cast("float").as("selection_rate"),
        rate($"tp", $"tp" + $"fn").cast("float").as("tpr"),
        rate($"fp", $"fp" + $"tn").cast("float").as("fpr"),
        (rate($"n_kept", $"n") - rate($"o_kept", $"o_n"))
          .cast("float").as("parity_gap"),
        (rate($"tp", $"tp" + $"fn") - rate($"o_tp", $"o_tp" + $"o_fn"))
          .cast("float").as("tpr_gap"),
        (rate($"fp", $"fp" + $"tn") - rate($"o_fp", $"o_fp" + $"o_tn"))
          .cast("float").as("fpr_gap"))
      .orderBy($"source")
  }

  /** q244: leave-one-source-out quality ablation — the cheapest form
    * of data valuation (the direction Shapley-style data attribution
    * approximates, public framing e.g. Ghorbani & Zou 2019): for each
    * source, the corpus-mean q112 quality WITHOUT that source, in
    * closed form from per-source sufficient statistics — no
    * re-scoring, no second corpus pass. `delta_if_removed` > 0 means
    * dropping the source RAISES corpus quality: the source is a drag
    * and a curation candidate; < 0 means it carries quality.
    *
    * Cross-engine exactness: float scores sum per source in doc_id
    * order, the corpus total folds the bounded per-source sums in
    * source order (two-level ordered fold, q225 discipline), and each
    * mean/delta is one fixed-shape double chain presented FLOAT; the
    * single-source degenerate case guards to NULL.
    *
    * Scale shape: the q112 doc aggregate + one source-keyed aggregate
    * (bounded by |sources|); totals ride a broadcast one-row frame.
    */
  def q244SourceAblation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = LangModel.qualityScores(s, dir)
      .join(Tables.load(s, dir, "documents").select($"doc_id", $"source"),
        Seq("doc_id"))
      .select($"source", $"doc_id", $"quality_score".cast("double").as("q"))
    val perSource = scored.groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        LangModel.orderedSum($"doc_id", $"q").as("sum_q"))
      .localCheckpoint(true) // read by the total fold and the output
    val tot = perSource.agg(
      sum($"n_docs").as("tot_n"),
      LangModel.orderedSum($"source", $"sum_q").as("tot_q"))
    perSource.crossJoin(broadcast(tot))
      .select($"source", $"n_docs",
        ($"sum_q" / $"n_docs").cast("float").as("mean_q"),
        ($"tot_q" / $"tot_n").cast("float").as("mean_corpus"),
        when($"tot_n" === $"n_docs", lit(null).cast("float"))
          .otherwise((($"tot_q" - $"sum_q") / ($"tot_n" - $"n_docs")
            - $"tot_q" / $"tot_n").cast("float")).as("delta_if_removed"))
      .orderBy($"source")
  }

  val q244SourceAblationSql: String =
    s"""WITH ${LangModel.qualityScoresCte},
      |sc AS (
      |  SELECT d.source, q.doc_id, CAST(q.quality_score AS DOUBLE) AS q
      |  FROM qscore q JOIN documents d ON d.doc_id = q.doc_id),
      |ps AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    list_sum(list(q ORDER BY doc_id)) AS sum_q
      |  FROM sc GROUP BY source),
      |t AS (
      |  SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_n,
      |    list_sum(list(sum_q ORDER BY source)) AS tot_q
      |  FROM ps)
      |SELECT ps.source, ps.n_docs,
      |  CAST(ps.sum_q / ps.n_docs AS FLOAT) AS mean_q,
      |  CAST(t.tot_q / t.tot_n AS FLOAT) AS mean_corpus,
      |  CAST(CASE WHEN t.tot_n = ps.n_docs THEN NULL
      |            ELSE (t.tot_q - ps.sum_q) / (t.tot_n - ps.n_docs)
      |                 - t.tot_q / t.tot_n END AS FLOAT) AS delta_if_removed
      |FROM ps CROSS JOIN t
      |ORDER BY source""".stripMargin

  val q234FairnessAuditSql: String =
    s"""WITH ${LangModel.qualityScoresCte},
      |sc AS (
      |  SELECT d.source,
      |    CASE WHEN q.lang = 'en' THEN 1 ELSE 0 END AS y,
      |    CASE WHEN q.quality_score >= 0.5 THEN 1 ELSE 0 END AS pred
      |  FROM qscore q JOIN documents d ON d.doc_id = q.doc_id),
      |g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pred) AS BIGINT) AS n_kept,
      |    CAST(SUM(pred * y) AS BIGINT) AS tp,
      |    CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
      |    CAST(SUM((1 - pred) * y) AS BIGINT) AS fn,
      |    CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn
      |  FROM sc GROUP BY source),
      |o AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS o_n, CAST(SUM(n_kept) AS BIGINT) AS o_kept,
      |    CAST(SUM(tp) AS BIGINT) AS o_tp, CAST(SUM(fp) AS BIGINT) AS o_fp,
      |    CAST(SUM(fn) AS BIGINT) AS o_fn, CAST(SUM(tn) AS BIGINT) AS o_tn
      |  FROM g)
      |SELECT g.source, g.n, g.n_kept, g.tp, g.fp, g.fn, g.tn,
      |  CAST(CASE WHEN g.n <> 0 THEN CAST(g.n_kept AS DOUBLE) / CAST(g.n AS DOUBLE) END AS FLOAT) AS selection_rate,
      |  CAST(CASE WHEN g.tp + g.fn <> 0 THEN CAST(g.tp AS DOUBLE) / CAST(g.tp + g.fn AS DOUBLE) END AS FLOAT) AS tpr,
      |  CAST(CASE WHEN g.fp + g.tn <> 0 THEN CAST(g.fp AS DOUBLE) / CAST(g.fp + g.tn AS DOUBLE) END AS FLOAT) AS fpr,
      |  CAST((CASE WHEN g.n <> 0 THEN CAST(g.n_kept AS DOUBLE) / CAST(g.n AS DOUBLE) END)
      |     - (CASE WHEN o.o_n <> 0 THEN CAST(o.o_kept AS DOUBLE) / CAST(o.o_n AS DOUBLE) END) AS FLOAT) AS parity_gap,
      |  CAST((CASE WHEN g.tp + g.fn <> 0 THEN CAST(g.tp AS DOUBLE) / CAST(g.tp + g.fn AS DOUBLE) END)
      |     - (CASE WHEN o.o_tp + o.o_fn <> 0 THEN CAST(o.o_tp AS DOUBLE) / CAST(o.o_tp + o.o_fn AS DOUBLE) END) AS FLOAT) AS tpr_gap,
      |  CAST((CASE WHEN g.fp + g.tn <> 0 THEN CAST(g.fp AS DOUBLE) / CAST(g.fp + g.tn AS DOUBLE) END)
      |     - (CASE WHEN o.o_fp + o.o_tn <> 0 THEN CAST(o.o_fp AS DOUBLE) / CAST(o.o_fp + o.o_tn AS DOUBLE) END) AS FLOAT) AS fpr_gap
      |FROM g CROSS JOIN o
      |ORDER BY source""".stripMargin

  /** Rank depth of the q264 nDCG report. */
  private val NdcgK = 10

  /** q264 — nDCG@10 of embedding retrieval (Järvelin & Kekäläinen
    * 2002): the graded-relevance metric the retrieval-eval family was
    * missing beside recall/MRR/precision@k. Queries are the 1% vec_id
    * sample; each query's ranked list is the exact cosine top-10
    * (the deliberate brute eval baseline of the q50/q212 class — the
    * production list comes from the registered ANN paths); gain = 1
    * when the neighbor shares the query's label. DCG folds
    * gain/log2(rank+1) in rank order; IDCG places the query's R
    * same-label vectors first (Σ_{i≤min(R,10)} 1/log2(i+1) — a
    * bounded in-row fold over the exact relevant count); queries with
    * R = 0 have no defined ideal and are excluded by both engines.
    * Output: per label, the query count and mean nDCG@10 (folded in
    * qid order; floats per the libm `ln` rule).
    *
    * At 100 TB: the ranked lists are top-k windows over the scored
    * pairs (WindowGroupLimit prunes map-side); the relevant-count
    * frame is one label-keyed aggregate broadcast back; everything
    * after the lists is label-sized.
    */
  def q264Ndcg(s: SparkSession, dir: String, k: Int = NdcgK): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val e = Tables.load(s, dir, "embeddings")
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"),
        $"label".as("qlabel"))
    val labelCounts = e.groupBy($"label".as("qlabel"))
      .agg(count(lit(1)).as("nlab"))
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid")
    val ranked = e.select($"vec_id".as("nid"), $"embedding".as("ne"),
        $"label".as("nlabel"))
      .crossJoin(broadcast(q))
      .filter($"nid" =!= $"qid")
      .withColumn("cos_sim",
        call_function("cosine_similarity", $"qe", $"ne"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
    val ln2 = log(lit(2.0))
    val dcg = ranked
      .select($"qid", $"qlabel", $"rnk",
        (when($"nlabel" === $"qlabel", lit(1.0)).otherwise(lit(0.0))
          * ln2 / log($"rnk".cast("double") + lit(1.0))).as("g"))
      .groupBy($"qid", $"qlabel")
      .agg(LangModel.orderedSum($"rnk", $"g").as("dcg"))
    val withIdeal = dcg.join(broadcast(labelCounts), Seq("qlabel"))
      // R relevant = same-label vectors minus the query itself
      .withColumn("r", least($"nlab" - 1L, lit(k.toLong)))
      .filter($"r" > 0L)
      .withColumn("idcg",
        aggregate(sequence(lit(1L), $"r"), lit(0.0),
          (acc, i) => acc + ln2 / log(i.cast("double") + lit(1.0))))
      .select($"qid", $"qlabel", ($"dcg" / $"idcg").as("ndcg"))
    withIdeal.groupBy($"qlabel".as("label"))
      .agg(count(lit(1)).as("n_queries"),
        (LangModel.orderedSum($"qid", $"ndcg")
          / count(lit(1))).cast("float").as("mean_ndcg"))
      .orderBy($"label")
  }

  def q264NdcgSql(k: Int = NdcgK): String = {
    val dim = 64
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
      |           FROM embeddings WHERE vec_id % 100 = 0),
      |lc AS (SELECT label AS qlabel, CAST(COUNT(*) AS BIGINT) AS nlab
      |       FROM embeddings GROUP BY 1),
      |ranked AS (
      |  SELECT qid, qlabel, rnk, nlabel FROM (
      |    SELECT q.qid, q.qlabel, e.label AS nlabel,
      |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
      |        ${dot("q.qe", "e.embedding")} /
      |        (sqrt(${dot("q.qe", "q.qe")}) * sqrt(${dot("e.embedding", "e.embedding")})) DESC,
      |        e.vec_id) AS rnk
      |    FROM q, embeddings e WHERE e.vec_id <> q.qid)
      |  WHERE rnk <= $k),
      |dcg AS (
      |  SELECT qid, qlabel,
      |    list_sum(list(
      |      (CASE WHEN nlabel = qlabel THEN CAST(1.0 AS DOUBLE)
      |            ELSE CAST(0.0 AS DOUBLE) END)
      |        * ln(CAST(2.0 AS DOUBLE)) / ln(CAST(rnk AS DOUBLE) + CAST(1.0 AS DOUBLE))
      |      ORDER BY rnk)) AS dcg
      |  FROM ranked GROUP BY 1, 2),
      |nd AS (
      |  SELECT qid, qlabel, dcg / list_sum(list_transform(range(1, r + 1),
      |      i -> ln(CAST(2.0 AS DOUBLE)) / ln(CAST(i AS DOUBLE) + CAST(1.0 AS DOUBLE))))
      |    AS ndcg
      |  FROM (SELECT dcg.qid, dcg.qlabel, dcg.dcg,
      |          least(lc.nlab - 1, $k) AS r
      |        FROM dcg JOIN lc ON lc.qlabel = dcg.qlabel)
      |  WHERE r > 0)
      |SELECT qlabel AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(list_sum(list(ndcg ORDER BY qid)) / CAST(COUNT(*) AS BIGINT) AS FLOAT)
      |    AS mean_ndcg
      |FROM nd GROUP BY 1 ORDER BY label""".stripMargin
  }
}

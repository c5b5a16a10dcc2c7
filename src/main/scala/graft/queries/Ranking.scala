package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Full-text relevance ranking over the documents corpus: Okapi BM25,
  * the standard lexical scoring function (public formulation, e.g.
  * Robertson & Zaragoza 2009; Lucene's default similarity) — the
  * retrieval primitive a training-data pipeline uses for targeted
  * corpus queries ("find documents about X") alongside the embedding
  * ANN family (Similarity.scala).
  *
  * Determinism note (the q53 convention): every per-document input to
  * the score (tf, dl) and every corpus statistic (N, df, Σdl) is an
  * exact integer aggregate; the score is then ONE fixed-shape double
  * expression over those exact inputs, with the per-term parts summed
  * in fixed textual order — bit-identical in any engine evaluating the
  * same formula. `ln` is bit-verified against DuckDB on this data.
  *
  * At 100 TB: the per-document stage is a pure map-side scan (tf/dl are
  * per-row array ops, no explode); corpus stats are one all-reduce to a
  * single row, broadcast back; top-k is TakeOrderedAndProject (no global
  * sort). For ad-hoc terms at scale the df lookup would come from a
  * maintained vocabulary table (q66's df profile) instead of a rescan.
  */
object Ranking {

  private val K1 = 1.2
  private val B  = 0.75

  /** Query terms: one rare ("dup", df≈5% — carries high idf), two from
    * the corpus's flat high-frequency band. Saturation + length
    * normalization still discriminate within the flat band.
    */
  private val Terms = Seq("dup", "spark", "key")

  /** Per-doc (doc_id, dl, tf_t...) frame for a term set — the q82/q239
    * map-side scan (per-row array ops, no explode).
    */
  private def tfFrame(s: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id" +: size($"ws").cast("long").as("dl") +:
        terms.map(t =>
          size(filter($"ws", w => w === t)).cast("long").as(s"tf_$t")): _*)
  }

  /** One-row corpus statistics (n_docs, sum_dl, df_t...) for a tf frame. */
  private def corpusStats(perDoc: DataFrame, terms: Seq[String]): DataFrame =
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)

  /** Per-term BM25 part — the expression SHAPE (parenthesization,
    * constant literals, operand order) mirrors the SQL twins exactly so
    * double results are bit-identical.
    */
  private def bm25Part(t: String): Column = {
    val tf = col(s"tf_$t"); val df = col(s"df_$t")
    log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0)) *
      (tf * lit(2.2)) /
      (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") /
        (col("sum_dl").cast("double") / col("n_docs"))))
  }

  def q82Bm25(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    val perDoc = tfFrame(s, dir, Terms)
    val corpus = corpusStats(perDoc, Terms)
    def part(t: String): Column = bm25Part(t)
    perDoc.crossJoin(broadcast(corpus))
      .select($"doc_id" +: $"dl" +: Terms.map(t => col(s"tf_$t")) :+
        // float presentation BEFORE the ranking: the round-16 full
        // sf0.1 sweep caught a 1-ulp ln divergence on a term set the
        // original bit-verification never saw (the q239 rank-key rule)
        Terms.map(part).reduce(_ + _).cast("float").as("score"): _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  val q82Bm25Sql: String = {
    def tfCol(t: String) =
      s"CAST(len(list_filter(ws, w -> w = '$t')) AS BIGINT) AS tf_$t"
    def dfCol(t: String) =
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t"
    def partSql(t: String) =
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * " +
        s"(tf_$t * 2.2) / " +
        s"(tf_$t + $K1 * (1.0 - $B + $B * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
      |    ${Terms.map(tfCol).mkString(",\n    ")}
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    ${Terms.map(dfCol).mkString(",\n    ")}
      |  FROM d)
      |SELECT doc_id, dl, ${Terms.map(t => s"tf_$t").mkString(", ")},
      |  CAST(${Terms.map(partSql).mkString("\n  + ")} AS FLOAT) AS score
      |FROM d, c
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q299: Dirichlet-smoothed query likelihood — the language-modeling
    * retrieval framework (Zhai & Lafferty 2001, "A study of smoothing
    * methods for language models applied to ad hoc information
    * retrieval"), the OTHER classic lexical scorer beside q82's BM25
    * (Lucene ships both as LMDirichletSimilarity / BM25Similarity):
    *
    *   score(Q, d) = Σ_t ln( (tf_td + μ·P(t|C)) / (dl_d + μ) )
    *
    * with P(t|C) = ctf_t / |C| the collection unigram model and
    * μ = 2000 (the paper's robust setting). Same determinism contract
    * as q82: tf/dl/ctf/|C| are exact integer aggregates, the score is
    * ONE fixed-shape double chain — and, per the libm rank rule, the
    * score is FLOAT-presented before the ordering so near-ties cannot
    * rank differently across engines.
    *
    * At 100 TB: identical shape to q82 — map-side tf scan, one-row
    * broadcast stats, TakeOrderedAndProject top-k.
    */
  def q299DirichletQl(s: SparkSession, dir: String, k: Int = 20,
      mu: Double = 2000.0): DataFrame = {
    import s.implicits._
    val perDoc = tfFrame(s, dir, Terms)
    val statCols = sum($"dl").cast("long").as("total_tokens") +:
      Terms.map(t => sum(col(s"tf_$t")).cast("long").as(s"ctf_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    def part(t: String): Column =
      log((col(s"tf_$t") + lit(mu) *
        (col(s"ctf_$t").cast("double") / col("total_tokens"))) /
        (col("dl") + lit(mu)))
    perDoc.crossJoin(broadcast(stats))
      .select($"doc_id" +: $"dl" +: Terms.map(t => col(s"tf_$t")) :+
        Terms.map(part).reduce(_ + _).cast("float").as("score"): _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  def q299DirichletQlSql(k: Int = 20, mu: Double = 2000.0): String = {
    def tfCol(t: String) =
      s"CAST(len(list_filter(ws, w -> w = '$t')) AS BIGINT) AS tf_$t"
    def ctfCol(t: String) = s"CAST(SUM(tf_$t) AS BIGINT) AS ctf_$t"
    def partSql(t: String) =
      s"ln((tf_$t + $mu * (CAST(ctf_$t AS DOUBLE) / total_tokens)) / (dl + $mu))"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
      |    ${Terms.map(tfCol).mkString(",\n    ")}
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |c AS (
      |  SELECT CAST(SUM(dl) AS BIGINT) AS total_tokens,
      |    ${Terms.map(ctfCol).mkString(",\n    ")}
      |  FROM d)
      |SELECT doc_id, dl, ${Terms.map(t => s"tf_$t").mkString(", ")},
      |  CAST(${Terms.map(partSql).mkString("\n  + ")} AS FLOAT) AS score
      |FROM d, c
      |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** q140: weighted near-dup pairs by TF-IDF cosine over word bigrams —
    * the lexical-WEIGHTED twin of q40's set Jaccard: shared RARE
    * phrasing counts far more than shared boilerplate, so it surfaces
    * pairs whose overlap is distinctive even when raw set overlap is
    * diluted. Feature space = word bigrams with a df cap (ubiquitous
    * bigrams dropped — the stopword analog), which also bounds the
    * posting self-join: Σ_{df≤cap} df² ≤ cap·Σdf, LINEAR in the corpus
    * for a fixed cap (the q126 prefix filter composes on top when the
    * cap alone is too loose). idf/weights are one fixed-shape double
    * expression over exact integer tf/df/N; the three accumulated sums
    * (two norms, the dot) are partition-order-dependent, so the cosine
    * is rounded to 6 dp on BOTH engines before the threshold and the
    * output — relative sum error ~1e-13 vs the 1e-6 grid (the q134
    * bound), with the same measure-zero grid-boundary residual q128
    * accepts.
    */
  def q140TfidfPairs(s: SparkSession, dir: String,
      tauCos: Double = 0.9, dfCap: Long = 100L): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val docs = Tables.load(s, dir, "documents")
    val toks = docs
      .select($"doc_id",
        explode(call_function("word_ngrams", $"text", lit(2))).as("g"))
    val tf = toks.groupBy($"doc_id", $"g").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfc = tf.groupBy($"g").agg(count(lit(1)).as("df")).filter($"df" <= dfCap)
    // Materialize the weighted postings ONCE: the norm aggregate and both
    // sides of the dot-product self-join read this frame, and without the
    // lineage cut each branch re-runs the explode + tf aggregate (4 corpus
    // scans at sf0.001, measured). The bench sweeps the checkpoint after
    // the query; the 1-row n_docs cross join also stays out of the final
    // pair-join plan this way.
    val wts = tf.join(dfc, "g").crossJoin(broadcast(nDocs))
      .select($"doc_id", $"g",
        ($"tf" * (log(($"n_docs" + lit(1.0)) / ($"df" + lit(1.0))) + lit(1.0)))
          .as("wt"))
      .localCheckpoint(true)
    val norms = wts.groupBy($"doc_id").agg(sqrt(sum($"wt" * $"wt")).as("nrm"))
    val dots = wts.as("a").join(wts.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(sum($"a.wt" * $"b.wt").as("dot"))
    dots.join(norms.as("na"), $"d1" === $"na.doc_id")
      .join(norms.as("nb"), $"d2" === $"nb.doc_id")
      .withColumn("cos_sim", round($"dot" / ($"na.nrm" * $"nb.nrm"), 6))
      .filter($"cos_sim" >= tauCos)
      .select($"d1", $"d2", $"cos_sim")
      .orderBy($"d1", $"d2")
  }

  val q140TfidfPairsSql: String =
    """WITH b AS (
      |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws), 1)),
      |    i -> ws[i] || ' ' || ws[i + 1])) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |tf AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS tf FROM b GROUP BY 1, 2),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |dfc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM tf
      |        GROUP BY 1 HAVING COUNT(*) <= 100),
      |w AS (SELECT tf.doc_id, tf.g,
      |        tf.tf * (ln((nd.n_docs + 1.0) / (dfc.df + 1.0)) + 1.0) AS wt
      |      FROM tf JOIN dfc USING (g) CROSS JOIN nd),
      |nrm AS (SELECT doc_id, sqrt(SUM(wt * wt)) AS nrm FROM w GROUP BY 1),
      |dot AS (SELECT a.doc_id AS d1, b.doc_id AS d2, SUM(a.wt * b.wt) AS dot
      |        FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id
      |        GROUP BY 1, 2)
      |SELECT d1, d2, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
      |FROM dot JOIN nrm na ON na.doc_id = d1
      |         JOIN nrm nb ON nb.doc_id = d2
      |WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.9
      |ORDER BY d1, d2""".stripMargin

  /** q184: trending movers — parts whose popularity RANK climbed most
    * year-over-year (2000 → 2001 ship counts): the "what's trending"
    * report computed on rank deltas, which are robust to overall volume
    * shifts in a way raw count deltas are not. Both periods aggregate
    * in ONE scan (conditional sums); ranks come from the q153
    * distributed range-partition row_number per period (catalog-sized
    * frame, still never a single-partition window); the delta join is
    * rank-frame-sized and the final top-k is `TakeOrderedAndProject`.
    * Only parts shipped in BOTH periods carry a well-defined rank
    * delta; entries/exits are a different report.
    */
  def q184Trending(s: SparkSession, dir: String,
      k: Int = 20, parts: Int = 32): DataFrame = {
    import s.implicits._
    val counts = Tables.load(s, dir, "lineitem")
      .filter(year($"l_shipdate").isin(2000, 2001))
      .groupBy($"l_partkey")
      .agg(
        sum(when(year($"l_shipdate") === 2000, 1L).otherwise(0L)).as("ca"),
        sum(when(year($"l_shipdate") === 2001, 1L).otherwise(0L)).as("cb"))
      .filter($"ca" > 0 && $"cb" > 0)
    def ranked(cnt: String, rk: String): DataFrame = {
      val (ranged, off) = Prefix.boundedPrefix(
        counts.select($"l_partkey", col(cnt)), parts, lit(1L),
        col(cnt).desc, $"l_partkey".asc)
      ranged.withColumn("prn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"pid")
            .orderBy(col(cnt).desc, $"l_partkey".asc)).cast("long"))
        .join(broadcast(off), "pid")
        .select($"l_partkey", col(cnt), ($"prn" + $"off").as(rk))
    }
    ranked("ca", "rank_2000").join(ranked("cb", "rank_2001"), "l_partkey")
      .select($"l_partkey", $"ca".as("n_2000"), $"cb".as("n_2001"),
        $"rank_2000", $"rank_2001",
        ($"rank_2000" - $"rank_2001").as("rank_climb"))
      .orderBy($"rank_climb".desc, $"l_partkey")
      .limit(k)
  }

  val q184TrendingSql: String =
    """WITH c AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CASE WHEN year(l_shipdate) = 2000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN year(l_shipdate) = 2001 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM lineitem WHERE year(l_shipdate) IN (2000, 2001)
      |  GROUP BY 1 HAVING SUM(CASE WHEN year(l_shipdate) = 2000 THEN 1
      |    ELSE 0 END) > 0 AND SUM(CASE WHEN year(l_shipdate) = 2001
      |    THEN 1 ELSE 0 END) > 0),
      |r AS (
      |  SELECT l_partkey, ca, cb,
      |    CAST(row_number() OVER (ORDER BY ca DESC, l_partkey) AS BIGINT)
      |      AS rank_2000,
      |    CAST(row_number() OVER (ORDER BY cb DESC, l_partkey) AS BIGINT)
      |      AS rank_2001
      |  FROM c)
      |SELECT l_partkey, ca AS n_2000, cb AS n_2001, rank_2000, rank_2001,
      |  rank_2000 - rank_2001 AS rank_climb
      |FROM r ORDER BY rank_climb DESC, l_partkey LIMIT 20""".stripMargin

  /** q166: reciprocal-rank fusion of the lexical (BM25, q82) and
    * semantic (embedding-cosine, q50 family) rankings —
    * RRF(d) = Σ_lists 1/(60+rank_d), the standard zero-tuning hybrid-
    * retrieval combiner (Cormack et al. 2009; k=60). A document missing
    * from one list contributes only its present term.
    *
    * Scale shape: each list is top-`k` via `TakeOrderedAndProject`
    * (per-partition heaps — no global sort of the corpus); the rank
    * assignment and the fusion join live on the two BOUNDED k-row
    * frames. The fused score is two fixed-shape divisions over exact
    * integer ranks added in fixed order — bit-identical cross-engine,
    * so membership AND order both gate exactly.
    */
  def q166Rrf(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    graft.GraftExtensions.register(s)
    import s.implicits._
    val lex = q82Bm25(s, dir, k)
      .withColumn("lex_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"score".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"lex_rank")
    val e = Tables.load(s, dir, "embeddings")
    val qv = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val sem = e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(qv))
      .select($"vec_id".as("doc_id"),
        call_function("cosine_similarity", $"qe", $"embedding").as("cos_sim"))
      .orderBy($"cos_sim".desc, $"doc_id").limit(k)
      .withColumn("sem_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"cos_sim".desc, $"doc_id")).cast("long"))
      .select($"doc_id", $"sem_rank")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + $"lex_rank"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + $"sem_rank"), lit(0.0)))
      .orderBy($"rrf".desc, $"doc_id")
  }

  val q166RrfSql: String = {
    def tfCol(t: String) =
      s"CAST(len(list_filter(ws, w -> w = '$t')) AS BIGINT) AS tf_$t"
    def dfCol(t: String) =
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t"
    def partSql(t: String) =
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * " +
        s"(tf_$t * 2.2) / " +
        s"(tf_$t + $K1 * (1.0 - $B + $B * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
      |    ${Terms.map(tfCol).mkString(",\n    ")}
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    ${Terms.map(dfCol).mkString(",\n    ")}
      |  FROM d),
      |lex AS (
      |  SELECT doc_id, ${Terms.map(partSql).mkString("\n  + ")} AS score
      |  FROM d, c ORDER BY score DESC, doc_id LIMIT 50),
      |lexr AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
      |    AS BIGINT) AS lex_rank FROM lex),
      |sem AS (
      |  SELECT e.vec_id AS doc_id,
      |    ${dot("qe", "e.embedding")} /
      |    (sqrt(${dot("qe", "qe")}) * sqrt(${dot("e.embedding", "e.embedding")})) AS cos_sim
      |  FROM (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q,
      |    embeddings e
      |  WHERE e.vec_id <> 0
      |  ORDER BY cos_sim DESC, doc_id LIMIT 50),
      |semr AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
      |    AS BIGINT) AS sem_rank FROM sem)
      |SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id, lex_rank, sem_rank,
      |  COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0.0)
      |    + COALESCE(CAST(1.0 AS DOUBLE) / (60 + sem_rank), 0.0) AS rrf
      |FROM lexr l FULL JOIN semr r USING (doc_id)
      |ORDER BY rrf DESC, doc_id""".stripMargin
  }

  /** q216: exponentially-decayed activity score — the "what's hot NOW"
    * ranking a feed or monitoring page runs (q184 compares two fixed
    * periods; decay weights ALL history, recent days exponentially
    * more): per event type, `Σ_days n_d · e^(−0.1·age_d)` against the
    * corpus's newest day. Daily counts and ages are exact integers;
    * the decayed terms sum in age order (the q104 ordered-fold
    * discipline) and the score presents as float (libm `exp` 1-ulp
    * rule). The half-life (~7 days at λ=0.1) rides both engines as
    * the same literal. One (type, day) aggregate; the fold runs on
    * the bounded day axis.
    */
  def q216DecayedTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.load(s, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val h = daily.agg(max($"day").as("h"))
    daily.crossJoin(broadcast(h))
      .withColumn("age", datediff($"h", $"day").cast("long"))
      .withColumn("term", $"n" * exp(lit(-0.1) * $"age"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"n").as("total"),
        graft.queries.LangModel.orderedSum($"age", $"term").as("sc"))
      .select($"event_type", $"n_days", $"total",
        $"sc".cast("float").as("decayed_score"))
      .orderBy($"decayed_score".desc, $"event_type")
  }

  val q216DecayedTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |h AS (SELECT MAX(day) AS h FROM daily),
      |t AS (
      |  SELECT event_type, n,
      |    CAST(date_diff('day', day, h) AS BIGINT) AS age,
      |    n * exp(-0.1 * CAST(date_diff('day', day, h) AS BIGINT)) AS term
      |  FROM daily CROSS JOIN h)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(n) AS BIGINT) AS total,
      |  CAST(list_sum(list(term ORDER BY age)) AS FLOAT) AS decayed_score
      |FROM t GROUP BY event_type
      |ORDER BY decayed_score DESC, event_type""".stripMargin

  /** q200: per-document keyword extraction — the top-5 TF-IDF terms of
    * every document, the light-weight tagging/labeling pass a corpus
    * browser or mixture debugger runs (q140 scores whole-document
    * pairs; this surfaces WHICH words carry each document). tf and df
    * are exact integer aggregates (df over distinct (doc, word) — one
    * aggregate, no distinct shuffle on top); `ln((N+1)/(df+1))` is one
    * fixed-shape double (bit-verified ln, integer-ratio input),
    * float-presented; and the per-document top-5 is a doc-partitioned
    * `row_number` that Spark executes as a map-side WindowGroupLimit
    * pre-prune — no document's candidate list survives past rank 5
    * into the sort. At 100 TB: one (doc, word) shuffle + one broadcast
    * scalar; the window repartitions by doc_id only.
    */
  def q200TopkKeywords(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val tf = Tables.load(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val n = Tables.load(s, dir, "documents").agg(count(lit(1)).as("n"))
    val byDoc = Window.partitionBy($"doc_id")
      .orderBy($"score_d".desc, $"w")
    tf.join(df, "w")
      .crossJoin(broadcast(n))
      .withColumn("score_d", $"tf" * log(($"n" + 1).cast("double") / ($"df" + 1)))
      .withColumn("rnk", row_number().over(byDoc))
      .filter($"rnk" <= k)
      .select($"doc_id", $"rnk".cast("long").as("rnk"), $"w".as("keyword"),
        $"tf", $"score_d".cast("float").as("score"))
      .orderBy($"doc_id", $"rnk")
  }

  val q200TopkKeywordsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1, 2),
      |df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, w, tf.tf,
      |    tf.tf * ln(CAST(n + 1 AS DOUBLE) / (df + 1)) AS score_d
      |  FROM tf JOIN df USING (w) CROSS JOIN n),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score_d DESC, w) AS rnk
      |  FROM scored)
      |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, w AS keyword, tf,
      |  CAST(score_d AS FLOAT) AS score
      |FROM rk WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin

  /** The q239 mining query set: each a conjunctive term query whose
    * POSITIVES are the documents containing every term (relevance by
    * construction). `dup` is the corpus's one rare term, so the
    * positive sets are small and the negative pools large — the shape
    * hard-negative mining exists for.
    */
  private val MineQueries: Seq[(String, Seq[String])] = Seq(
    "dup+key"    -> Seq("dup", "key"),
    "dup+vector" -> Seq("dup", "vector"),
    "fast+line"  -> Seq("fast", "line"))
  private val MineTerms: Seq[String] = MineQueries.flatMap(_._2).distinct

  /** q239: BM25 hard-negative mining — the contrastive-training data
    * step (public recipe: DPR, Karpukhin et al. 2020 uses exactly
    * "top BM25 passages that don't contain the answer"): for each
    * query, rank the documents that match SOME but not ALL query terms
    * by BM25 and keep the top k — lexically close non-positives, the
    * negatives that teach a retriever the hardest distinctions.
    * Positives (all terms present) are excluded by construction;
    * zero-overlap documents score no terms and are excluded too.
    *
    * Determinism: tf/df/dl/N are exact integers, each score is the
    * q82 fixed-shape double expression (shared `bm25Part`), rank ties
    * break on doc_id.
    *
    * Scale shape: ONE corpus scan builds tf for the bounded term
    * union (map-side, no explode), corpus stats are one all-reduce
    * row broadcast back, each query's score/filter is a map-only
    * projection of that same frame, and the per-query top-k is a
    * rank-filter window (WindowGroupLimit — per-partition heaps, no
    * global sort) over |queries| partitions.
    */
  def q239HardNegatives(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import s.implicits._
    val perDoc = tfFrame(s, dir, MineTerms)
    val corpus = corpusStats(perDoc, MineTerms)
    val scored = perDoc.crossJoin(broadcast(corpus))
      .localCheckpoint(true) // one scan feeds every query's projection
    val perQuery = MineQueries.map { case (qid, terms) =>
      scored.select(
        lit(qid).as("qid"), $"doc_id",
        terms.map(t => when(col(s"tf_$t") > 0, 1L).otherwise(0L))
          .reduce(_ + _).as("n_present"),
        // float-present BEFORE ranking: these term sets hit ln inputs
        // where libm and the JVM differ in the last double ulp (the
        // q104 rule), and the rank must see identical keys
        terms.map(bm25Part).reduce(_ + _).cast("float").as("score"))
        .filter($"n_present" > 0 && $"n_present" < terms.length)
    }.reduce(_ unionByName _)
    val byQ = Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id")
    // filter the RAW row_number (cast after): a cast between the window
    // and the rank filter defeats the WindowGroupLimit map-side pruning
    perQuery.withColumn("rnk0", row_number().over(byQ))
      .filter($"rnk0" <= k)
      .select($"qid", $"rnk0".cast("long").as("rnk"), $"doc_id",
        $"n_present", $"score")
      .orderBy($"qid", $"rnk")
  }

  def q239HardNegativesSql(k: Int = 10): String = {
    def tfCol(t: String) =
      s"CAST(len(list_filter(ws, w -> w = '$t')) AS BIGINT) AS tf_$t"
    def dfCol(t: String) =
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t"
    def partSql(t: String) =
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * " +
        s"(tf_$t * 2.2) / " +
        s"(tf_$t + $K1 * (1.0 - $B + $B * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
    val queryRows = MineQueries.map { case (qid, terms) =>
      val present = terms.map(t =>
        s"CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END").mkString(" + ")
      s"""SELECT '$qid' AS qid, doc_id,
         |    CAST($present AS BIGINT) AS n_present,
         |    CAST(${terms.map(partSql).mkString("\n    + ")} AS FLOAT) AS score
         |  FROM d, c
         |  WHERE ($present) > 0 AND ($present) < ${terms.length}""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
      |    ${MineTerms.map(tfCol).mkString(",\n    ")}
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    ${MineTerms.map(dfCol).mkString(",\n    ")}
      |  FROM d),
      |neg AS (
      |  $queryRows),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
      |    ORDER BY score DESC, doc_id) AS rnk
      |  FROM neg)
      |SELECT qid, CAST(rnk AS BIGINT) AS rnk, doc_id, n_present, score
      |FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }
}

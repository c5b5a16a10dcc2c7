package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic corpus sampling — the training-data counterpart of
  * q39's split gate: weighted reservoir sampling (Efraimidis–Spirakis)
  * and exact per-stratum subsampling. Both derive their "randomness"
  * from the q39 md5 idiom, so the sample is a pure function of the
  * corpus and the DuckDB oracle replays it exactly.
  */
object Sampling {

  /** The q39 stable-uniform gate shifted into (0, 1]: the first 8 md5
    * hex chars as a 32-bit integer, +1 so `ln` never sees zero.
    */
  private def u01(tag: String, id: Column): Column =
    (conv(substring(md5(concat(lit(tag), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") + 1) / lit(4294967296.0)

  /** q124: weighted sampling without replacement, Efraimidis–Spirakis:
    * each doc draws a stable uniform u and ranks by `ln(u) / w` (the
    * log form of the classic `u^(1/w)` key — monotone-identical, and
    * `ln` agrees cross-engine to 1 ULP, hence the 12-dp key rounding
    * below); the top-k keys ARE a weighted sample without replacement.
    * Weight = n_chars, so long documents are proportionally favored —
    * the token-budget-aware subsample a mixture builder wants. The
    * whole query is one scan + `TakeOrderedAndProject`: no global sort,
    * no shuffle beyond top-k merge, the 100 TB plan.
    */
  def q124WeightedSample(s: SparkSession, dir: String, k: Int = 200): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"n_chars",
        // round to 12 dp: ln agrees cross-engine only to ~1 ULP, and the
        // rounded key is both the output AND the order key, so the
        // selected top-k set is identical by construction
        round(log(u01("wsamp:", $"doc_id")) / $"n_chars".cast("double"), 12)
          .as("es_key"))
      .orderBy($"es_key".desc, $"doc_id")
      .limit(k)
  }

  val q124WeightedSampleSql: String =
    """SELECT doc_id, source, n_chars,
      |  round(ln((CAST(('0x' || substring(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
      |     / 4294967296.0) / CAST(n_chars AS DOUBLE), 12) AS es_key
      |FROM documents
      |ORDER BY es_key DESC, doc_id LIMIT 200""".stripMargin

  /** q125: exact per-stratum subsample — k docs per source, chosen by
    * the stable md5 order (a deterministic reservoir per stratum). The
    * rank-filter form compiles to Spark's WindowGroupLimit: each map
    * task pre-prunes to its own top-k per stratum BEFORE the exchange,
    * so the shuffle carries O(k · strata · tasks) rows, not the corpus
    * — that optimization is exactly why this beats a
    * collect_list-and-slice formulation at 100 TB.
    */
  def q125StratifiedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import s.implicits._
    val byStratum = Window.partitionBy($"source")
      .orderBy(md5(concat(lit("strat:"), $"doc_id".cast("string"))), $"doc_id")
    Tables.load(s, dir, "documents")
      .select($"source", $"doc_id")
      .withColumn("rn", row_number().over(byStratum).cast("long"))
      .filter($"rn" <= k)
      .orderBy($"source", $"rn")
  }

  val q125StratifiedSampleSql: String =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
      |  FROM documents)
      |WHERE rn <= 50 ORDER BY source, rn""".stripMargin

  /** q136: token-budget-constrained corpus selection — the greedy
    * knapsack every mixture builder runs last: rank docs by quality
    * (type-token ratio here; any deterministic score plugs in), admit
    * in rank order while the running token total stays ≤ budget. The
    * running total is a GLOBAL ordered cumsum, executed as the q122
    * distributed prefix sum: range-partition on the (score DESC,
    * doc_id) total order, per-partition running sums, ≤`parts`-row
    * offset frame broadcast back — no single-partition window at any
    * corpus size. Unlike q122 the sort key is unique, so the prefix
    * sums ARE the global cumsum exactly; the score is one IEEE
    * division of exact integers, bit-identical cross-engine.
    */
  def q136TokenBudget(s: SparkSession, dir: String,
      budget: Long = 15000L, parts: Int = 32): DataFrame = {
    import s.implicits._
    val scored = Tables.load(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", size($"ws").cast("long").as("n_tok"),
        (size(array_distinct($"ws")).cast("double") / size($"ws")).as("score"))
      // checkpoint before the range exchange: the split-points sampler
      // re-executes a map-only child, and this one tokenizes every doc
      // (the q148 range-sampler lesson — here the child is codegen'd
      // collection ops, so the measured win is ~10% at sf1d, not
      // q148's ~5x; kept because the shape is the same)
      .localCheckpoint(true)
    val (ranged, offsets) = Prefix.boundedPrefixW(scored, parts,
      Seq("offset" -> $"n_tok"), $"score".desc, $"doc_id".asc)
    ranged
      .withColumn("run", sum($"n_tok").over(
        Window.partitionBy($"pid").orderBy($"score".desc, $"doc_id")))
      .join(broadcast(offsets), "pid")
      .withColumn("cum_tokens", $"run" + $"offset")
      .filter($"cum_tokens" <= budget)
      .select($"doc_id", $"n_tok", $"score", $"cum_tokens")
      .orderBy($"doc_id")
  }

  val q136TokenBudgetSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS score
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok, score,
      |    CAST(SUM(n_tok) OVER (ORDER BY score DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM d)
      |SELECT doc_id, n_tok, score, cum_tokens FROM c
      |WHERE cum_tokens <= 15000 ORDER BY doc_id""".stripMargin

  /** q149: water-filling mixture allocation — the other half of q136's
    * knapsack: given a global token budget B (a fraction of the corpus)
    * and per-source token supplies c_i, allocate min(c_i, λ) to each
    * source with the water level λ chosen so the allocations sum to B —
    * the standard cap-and-redistribute rule (max-min fairness) a
    * mixture builder uses so no single giant source swamps the blend.
    * λ has a closed form over the supply-sorted prefix sums: sources
    * are funded in ascending-supply order while c_k·(remaining sources)
    * fits the remaining budget — that test is EXACT INTEGER arithmetic
    * (multiplication form, no division), so the funded/unfunded cut
    * cannot drift between engines; λ itself is the single final
    * division. The corpus-sized work is one per-source aggregation;
    * everything after lives on the |sources| frame (bounded, so its
    * windows are cheap at any scale).
    */
  def q149Waterfill(s: SparkSession, dir: String,
      num: Long = 2L, den: Long = 5L): DataFrame = {
    import s.implicits._
    val sup = Tables.load(s, dir, "documents")
      .select($"source", size(split($"text", " ")).cast("long").as("t"))
      .groupBy($"source").agg(sum($"t").as("c"))
    val byC = Window.orderBy($"c", $"source")
    val f = sup
      .withColumn("rn", row_number().over(byC).cast("long"))
      .withColumn("prefix", sum($"c").over(byC))
      .crossJoin(broadcast(sup.agg(sum($"c").as("tot"),
        count(lit(1)).as("n"))))
      // budget B = floor(tot * num / den), exact integer division
      .withColumn("b", expr(s"(tot * $num) div $den"))
      // source rn is fully funded iff c·(n − rn + 1) ≤ B − (prefix − c):
      // all-integer comparison — no float boundary anywhere
      .withColumn("funded",
        $"c" * ($"n" - $"rn" + 1) <= $"b" - ($"prefix" - $"c"))
    val cut = f.agg(
      coalesce(max(when($"funded", $"rn")), lit(0L)).as("kstar"),
      coalesce(max(when($"funded", $"prefix")), lit(0L)).as("funded_sum"))
    f.crossJoin(broadcast(cut))
      .withColumn("lambda",
        ($"b" - $"funded_sum").cast("double") / ($"n" - $"kstar"))
      .select($"source", $"c".as("tokens"),
        when($"rn" <= $"kstar", $"c".cast("double"))
          .otherwise($"lambda").as("alloc"),
        (when($"rn" <= $"kstar", $"c".cast("double"))
          .otherwise($"lambda") / $"c").as("weight"))
      .orderBy($"source")
  }

  def q149WaterfillSql(num: Long = 2L, den: Long = 5L): String =
    s"""WITH sup AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS c
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot,
      |               CAST(COUNT(*) AS BIGINT) AS n FROM sup),
      |f AS (
      |  SELECT source, c,
      |    CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS rn,
      |    CAST(SUM(c) OVER (ORDER BY c, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
      |    tot, n, CAST(tot * $num // $den AS BIGINT) AS b
      |  FROM sup CROSS JOIN tot),
      |ff AS (SELECT *, c * (n - rn + 1) <= b - (prefix - c) AS funded FROM f),
      |cut AS (
      |  SELECT COALESCE(MAX(CASE WHEN funded THEN rn END), 0) AS kstar,
      |    CAST(COALESCE(MAX(CASE WHEN funded THEN prefix END), 0) AS BIGINT)
      |      AS funded_sum
      |  FROM ff)
      |SELECT source, c AS tokens,
      |  CASE WHEN rn <= kstar THEN CAST(c AS DOUBLE)
      |       ELSE CAST(b - funded_sum AS DOUBLE) / (n - kstar) END AS alloc,
      |  CASE WHEN rn <= kstar THEN CAST(c AS DOUBLE)
      |       ELSE CAST(b - funded_sum AS DOUBLE) / (n - kstar) END / c AS weight
      |FROM ff CROSS JOIN cut ORDER BY source""".stripMargin

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Consistent-hash ring: `vnodes` virtual points per shard at
    * `md5("s<shard>:<vnode>")`, returned as (sorted positions, aligned
    * shard ids). A pure function of the shard count — both the Spark
    * plan and the oracle SQL embed the identical literal ring.
    */
  private def ring(shards: Int, vnodes: Int): (Array[String], Array[Int]) = {
    val pts = for (sh <- 0 until shards; v <- 0 until vnodes)
      yield (md5hex(s"s$sh:$v"), sh)
    val sorted = pts.sortBy(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  /** q204: consistent-hash resharding plan — the movement matrix of
    * growing a hash ring from 8 to 9 shards (16 vnodes each), i.e.
    * exactly what a partition/shard expansion (a Kafka topic repartition,
    * a replica re-bucketing) must budget before it runs. Classic
    * consistent hashing (Karger et al., public recipe): a key moves
    * only when the new shard's vnodes land between the key and its old
    * successor, so ~1/9 of keys move and never between two OLD shards.
    * Both rings are tiny sorted literal arrays riding the plan as
    * constants; each doc's successor lookup is a per-row count of
    * ring positions ≤ its own md5 position (bounded 128/144-element
    * array scan, map-side; a native expression would fuse it at true
    * scale, the `sq8_encode` pattern); the movement matrix is one
    * ≤72-cell aggregate. All values are exact (md5 hex strings,
    * integer counts).
    */
  def q204Reshard(s: SparkSession, dir: String, vnodes: Int = 16): DataFrame = {
    import s.implicits._
    val (pa8, sa8) = ring(8, vnodes)
    val (pa9, sa9) = ring(9, vnodes)
    def assign(pa: Array[String], sa: Array[Int], dpos: Column): Column = {
      val cnt = size(filter(typedLit(pa), p => p <= dpos))
      get(typedLit(sa), pmod(cnt, lit(pa.length)))
    }
    Tables.load(s, dir, "documents")
      .select($"doc_id", md5($"doc_id".cast("string")).as("dpos"))
      .select(
        assign(pa8, sa8, $"dpos").cast("long").as("from_shard"),
        assign(pa9, sa9, $"dpos").cast("long").as("to_shard"))
      .groupBy($"from_shard", $"to_shard")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"from_shard", $"to_shard")
  }

  def q204ReshardSql(vnodes: Int = 16): String = {
    val (pa8, sa8) = ring(8, vnodes)
    val (pa9, sa9) = ring(9, vnodes)
    def lit8(a: Array[String]) = a.map(p => s"'$p'").mkString("[", ", ", "]")
    def litI(a: Array[Int]) = a.mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS dpos FROM documents),
      |a AS (
      |  SELECT
      |    CAST(${litI(sa8)}[1 + (len(list_filter(${lit8(pa8)}, p -> p <= dpos)) % ${pa8.length})] AS BIGINT) AS from_shard,
      |    CAST(${litI(sa9)}[1 + (len(list_filter(${lit8(pa9)}, p -> p <= dpos)) % ${pa9.length})] AS BIGINT) AS to_shard
      |  FROM d)
      |SELECT from_shard, to_shard, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM a GROUP BY 1, 2 ORDER BY from_shard, to_shard""".stripMargin
  }

  /** q283: rendezvous / highest-random-weight sharding (Thaler &
    * Ravishankar 1996) — q204's consistent-hash ring trades exactness
    * for vnode machinery; HRW needs neither: each key goes to the
    * shard with the highest hash(key, shard), and on growing S → S+1
    * a key moves IFF the new shard wins its rendezvous — the
    * minimal-movement property holds EXACTLY (expected moved fraction
    * = 1/(S+1)), not approximately-via-vnodes. The law is visible in
    * the registered output: assignment under 8 and under 9 shards
    * side by side with the moved flag, and `moved ⇒ shard9 = 8` is
    * spec-pinned row-by-row.
    *
    * At 100 TB this is the ideal shape: a PURE MAP — the shard set is
    * a literal, the argmax folds over a 9-element array per row
    * (bounded, the interpreted-lambda caveat does not bite), no join,
    * no aggregate, no shuffle except the presentation sort. Hash =
    * the md5-prefix 32-bit idiom both engines share; ties break to
    * the smaller shard id (never observed under md5, deterministic
    * anyway).
    */
  def q283HrwSharding(s: SparkSession, dir: String,
      shards: Int = 8): DataFrame = {
    import s.implicits._
    val hs = transform(sequence(lit(0), lit(shards)), sc => struct(
      conv(substring(md5(concat(lit("hrw:"), $"doc_id".cast("string"),
        lit(":"), sc.cast("string"))), 1, 8), 16, 10).cast("long").as("h"),
      (-sc).as("ns")))
    Tables.load(s, dir, "documents")
      .select($"doc_id", hs.as("hs"))
      .select($"doc_id",
        (-array_max(filter($"hs", x => x.getField("ns") > lit(-shards)))
          .getField("ns")).cast("long").as("shard8"),
        (-array_max($"hs").getField("ns")).cast("long").as("shard9"))
      .withColumn("moved", $"shard8" =!= $"shard9")
      .orderBy($"doc_id")
  }

  def q283HrwShardingSql(shards: Int = 8): String =
    s"""WITH h AS (SELECT doc_id, s,
      |  CAST(('0x' || substring(md5('hrw:' || CAST(doc_id AS VARCHAR)
      |    || ':' || CAST(s AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      |  FROM documents, (SELECT unnest(range(0, ${shards + 1})) AS s) t),
      |a9 AS (SELECT doc_id, s AS shard9 FROM
      |        (SELECT doc_id, s, row_number() OVER
      |           (PARTITION BY doc_id ORDER BY h DESC, s) AS rn FROM h)
      |       WHERE rn = 1),
      |a8 AS (SELECT doc_id, s AS shard8 FROM
      |        (SELECT doc_id, s, row_number() OVER
      |           (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
      |         FROM h WHERE s < $shards)
      |       WHERE rn = 1)
      |SELECT doc_id, CAST(shard8 AS BIGINT) AS shard8,
      |  CAST(shard9 AS BIGINT) AS shard9, shard8 <> shard9 AS moved
      |FROM a8 JOIN a9 USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q296: DSIR end-to-end — hashed n-gram importance weights PLUS the
    * resampling step (Xie et al., "Data Selection for Language Models
    * via Importance Resampling", 2023). q105 computes unigram-hashed
    * weights; the published method uses unigram+bigram hashed features
    * (§2.2) and then SAMPLES k documents without replacement with
    * probability ∝ exp(log-importance) — here via the Gumbel-top-k
    * identity (key = log w + Gumbel noise; the top-k keys ARE the
    * sample), which q124's Efraimidis–Spirakis form would overflow on:
    * exp(±hundreds of nats) is not representable, log w + g is.
    * "Randomness" is the q39 stable-uniform md5 idiom, so the selected
    * set is a pure function of the corpus and the oracle replays it.
    *
    * Target distribution = the English subset; raw = the whole corpus;
    * features = word unigrams AND bigrams hashed into B buckets with
    * +0.5 smoothing.
    *
    * At 100 TB: one fused native gram scan (unigrams + bigrams emitted
    * by two word_ngrams calls concatenated in one projection), one
    * B-bounded weights table (broadcast — bounded by the constant B,
    * never by data), one per-doc ordered fold, and the selection is
    * orderBy+limit = TakeOrderedAndProject: map-side top-k, no global
    * sort. The rank key is ROUNDED to 12 dp before ranking (ln agrees
    * cross-engine only to ~1 ulp — the q239/q124 libm rank-key rule)
    * with doc_id as the total-order tiebreak.
    */
  def q296DsirResample(s: SparkSession, dir: String, k: Int = 100,
      buckets: Int = 4096): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val feats = Tables.load(s, dir, "documents")
      .select($"doc_id", $"lang",
        posexplode(concat(
          call_function("word_ngrams", $"text", lit(1)),
          call_function("word_ngrams", $"text", lit(2)))).as(Seq("pos", "g")))
      .withColumn("bucket",
        conv(substring(md5($"g"), 1, 6), 16, 10).cast("long") % buckets)
    // raw + target counts in ONE corpus pass (conditional sum); the
    // grand totals then reduce the B-bounded frame, not the corpus —
    // model building costs one gram scan, scoring the other
    val bucketStats = feats.groupBy($"bucket").agg(
      count(lit(1)).as("rc"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).cast("long").as("tc"))
      .localCheckpoint(true) // B-bounded; feeds totals AND weights
    val totals = bucketStats.agg(sum($"rc").cast("long").as("rt"),
      sum($"tc").cast("long").as("tt"))
    val half = buckets * 0.5
    val weights = bucketStats
      .crossJoin(broadcast(totals))
      .select($"bucket",
        (log((coalesce($"tc", lit(0L)) + lit(0.5)) / ($"tt" + lit(half))) -
          log(($"rc" + lit(0.5)) / ($"rt" + lit(half)))).as("wt"))
    val li = feats.join(broadcast(weights), "bucket")
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_feats"), LangModel.orderedSum($"pos", $"wt").as("li"))
    // Gumbel-top-k: g = -ln(-ln u), u stable-uniform in (0, 1]
    val gumbel = -log(-log(u01("dsir:", $"doc_id")))
    li.select($"doc_id", $"lang", $"n_feats",
        $"li".cast("float").as("log_importance"),
        round($"li" + gumbel, 12).as("gumbel_key"))
      .orderBy($"gumbel_key".desc, $"doc_id")
      .limit(k)
  }

  def q296DsirResampleSql(k: Int = 100, buckets: Int = 4096): String = {
    val half = buckets * 0.5
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      |f AS (SELECT doc_id, lang, unnest(gs) AS g,
      |        generate_subscripts(gs, 1) AS pos
      |      FROM (SELECT doc_id, lang,
      |              list_concat(ws, list_transform(range(1, len(ws)),
      |                i -> ws[i] || ' ' || ws[i+1])) AS gs FROM d)),
      |fb AS MATERIALIZED (SELECT doc_id, lang, pos,
      |        CAST(('0x' || substring(md5(g), 1, 6)) AS BIGINT) % $buckets AS bucket
      |      FROM f),
      |raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rc FROM fb GROUP BY bucket),
      |tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tc
      |        FROM fb WHERE lang = 'en' GROUP BY bucket),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS rt,
      |          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
      |        FROM fb),
      |wts AS (SELECT raw.bucket,
      |          ln((COALESCE(tgt.tc, 0) + CAST(0.5 AS DOUBLE)) / (tot.tt + CAST($half AS DOUBLE)))
      |            - ln((raw.rc + CAST(0.5 AS DOUBLE)) / (tot.rt + CAST($half AS DOUBLE))) AS wt
      |        FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tot),
      |li AS (SELECT fb.doc_id, fb.lang, CAST(COUNT(*) AS BIGINT) AS n_feats,
      |         CAST(list_sum(list(wts.wt ORDER BY fb.pos)) AS DOUBLE) AS li
      |       FROM fb JOIN wts ON wts.bucket = fb.bucket
      |       GROUP BY fb.doc_id, fb.lang)
      |SELECT doc_id, lang, n_feats, CAST(li AS FLOAT) AS log_importance,
      |  round(li + (-ln(-ln(
      |    (CAST(('0x' || substring(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
      |      / 4294967296.0))), 12) AS gumbel_key
      |FROM li ORDER BY gumbel_key DESC, doc_id LIMIT $k""".stripMargin
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build a derived ~N× corpus from an existing sf directory for the
  * third scaling point (BENCH_SCALING.md): the driver caps generated
  * testdata at sf0.1, so scaling evidence past 10× needs a legitimate
  * synthetic decade — N disjoint SHARDS, each with exactly the source
  * corpus's internal structure, written to a scratch dir (never
  * touching the read-only testdata).
  *
  * The shard construction keeps every measured operator's work LINEAR
  * in N by keeping shards disjoint along the axis the operator pairs
  * on — the honest way a real corpus grows 10×:
  *  - documents: copy k remaps doc_id (+k·stride) and suffixes every
  *    token with "q" + the k-th alphabet letter (copy 0 verbatim; the
  *    all-letter suffix keeps derived tokens inside the `^[a-z]+$`
  *    word filter the tokenizer lanes apply, so those lanes see the
  *    full N× vocabulary), so copies share NO tokens / grams /
  *    shingles: each shard reproduces the original's
  *    near-dup/containment/prefix-join pair structure instead of
  *    creating cross-copy duplicate clusters (10 identical copies
  *    would make pair counts quadratic in N by construction — a
  *    workload CHANGE, not a scale-up).
  *  - events: copy k shifts time by k·(span rounded up to whole
  *    hours) and remaps user_id/event_id, so each shard is a disjoint
  *    time epoch with the original's per-hour session density
  *    (overlap-pair output scales ×N, as more DAYS of data would; 10×
  *    users in the SAME window would be ×N² output — again a
  *    different workload, not more of the same one).
  *  - embeddings: copy k remaps vec_id and shifts every coordinate by
  *    k·0.001, keeping labels — cell/bucket populations scale ×N for
  *    the top-k ANN lanes. LIMITATION: the constant shift makes the
  *    copies of one source vector near-PARALLEL (cos(v, v+c·1) ≈ 1),
  *    so cosine-THRESHOLD pair lanes (q43/q268) would see ~C(N,2)
  *    cross-copy pairs per source vector — quadratic, a workload
  *    change. Derived decades are valid for ANN top-k scaling rows,
  *    NOT for τ-pair linearity claims on the embedding axis.
  *  - customer/orders/lineitem: copy k shifts the FK chain
  *    (c_custkey/o_orderkey/o_custkey/l_orderkey) by k·stride and tags
  *    customer names with a doubled copy letter (see the in-line note:
  *    within-copy Hamming structure preserved, cross-copy entity pairs
  *    impossible); values/dates verbatim, dimension keys unchanged
  *    (facts grow, dimensions don't), dimensions copied verbatim.
  *
  * Usage: runMain graft.tools.DeriveScale
  *          [srcDir] [outDir] [copies] [letterOffset] [stride]
  * Second decade (sf2d = 100× sf0.1): derive from sf1d with
  * letterOffset 9 and stride 1000000000 — fresh copy letters,
  * key range above sf1d's, coordinate step above its accumulated
  * shift, so the disjointness invariants compose.
  */
object DeriveScale {
  val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/scratch/sf1d")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // COMPOSING decades (deriving sf2d from sf1d): the first decade's
    // copy letters are live in the source vocabulary, so a second
    // derivation must use FRESH letters (letterOffset = 9 continues at
    // 'j'), a stride above the source's key range (10× the default),
    // and a coordinate-shift step above the source's accumulated shift
    // — all three scale with letterOffset below; the vocabulary guard
    // re-verifies disjointness against whatever the source contains.
    val letterOffset = args.lift(3).map(_.toInt).getOrElse(0)
    val stride = args.lift(4).map(_.toLong).getOrElse(Stride)
    require(copies >= 1 && letterOffset >= 0 && letterOffset + copies <= 27,
      s"copies+offset must fit the alphabet, got $copies at offset $letterOffset")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ks = explode(sequence(lit(0), lit(copies - 1))).as("k")
    val kL = col("k").cast("long")

    // Disjointness guard for the "copies share NO tokens" invariant the
    // linear pair-structure scaling argument relies on: copy k's
    // vocabulary is {w + "q"+letter_k}, so a collision with copy 0
    // needs a SOURCE word that already ends in a used "q"+letter
    // suffix AND whose prefix is itself a source word (original "xqa"
    // = copy-1's "x"+"qa"). Assert none exist before deriving — if the
    // source corpus ever grows one, fail loudly instead of silently
    // bending the invariant. Vocabulary-sized work; no corpus re-scan
    // beyond the one distinct.
    val usedSuffixes = "abcdefghijklmnopqrstuvwxyz"
      .slice(letterOffset, letterOffset + copies - 1).map(l => s"q$l")
    if (usedSuffixes.nonEmpty) {
      val vocab = spark.read.parquet(s"$src/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w")).distinct()
        .localCheckpoint(true) // probed twice (candidates + prefix join)
      val collisions = vocab
        .filter(length(col("w")) > 2 &&
          substring(col("w"), -2, 2).isin(usedSuffixes: _*))
        .select(expr("substring(w, 1, length(w) - 2)").as("p"), col("w"))
        .join(vocab.withColumnRenamed("w", "p"), "p")
        .select(col("w")).limit(5).collect().map(_.getString(0))
      require(collisions.isEmpty,
        s"derived-suffix collision: source word(s) ${collisions.mkString(", ")} " +
          "end in a used 'q'+letter suffix with a prefix that is also a " +
          "source word; copies would share tokens and the linear " +
          "pair-structure invariant breaks — use fewer copies or a " +
          "different suffix scheme")
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(ks, col("*"))
      .select((col("doc_id") + kL * stride).as("doc_id"),
        // All-letter suffix ("q" + k-th alphabet letter) keeps derived
        // tokens inside the `^[a-z]+$` word filter the tokenizer lanes
        // (q231/q233/q250/q251) apply, so a 10x corpus really trains
        // them on 10x the vocabulary — while staying disjoint across
        // copies (a "_k" suffix made copies 1..N-1 invisible to them).
        when(col("k") === 0, col("text")).otherwise(array_join(
          transform(split(col("text"), " "),
            t => concat(t, lit("q"),
              substring(lit("abcdefghijklmnopqrstuvwxyz"),
                col("k") + letterOffset, lit(1)))), " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")

    // step grows with the decade so composed shifts stay unique:
    // decade-1 totals < 0.01, decade-2 steps are 0.01 multiples
    val shiftStep = 0.001f * (letterOffset + 1)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(ks, col("*"))
      .select((col("vec_id") + kL * stride).as("vec_id"),
        transform(col("embedding"),
          x => x + col("k").cast("float") * lit(shiftStep)).as("embedding"),
        col("label"))
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev0 = graft.sources.Tables.load(spark, src, "events")
    val mm = ev0.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0)
    val (tMin, tMax) = (mm.getLong(0), mm.getLong(1))
    val HourUs = 3600L * 1000000L
    val epochUs = ((tMax - tMin) / HourUs + 2) * HourUs
    val ev = ev0.select(ks, col("*"))
      .select((col("event_id") + kL * stride).as("event_id"),
        timestamp_micros(unix_micros(col("ts")) + kL * epochUs).as("ts"),
        (col("user_id") + kL * stride).as("user_id"),
        col("event_type"), col("value"), col("props"))
    ev.write.mode("overwrite").parquet(s"$out/events.parquet")

    // Star schema: disjoint KEY-SHIFTED copies preserving FK integrity
    // (copy k shifts c_custkey / o_orderkey / o_custkey / l_orderkey by
    // k·stride — each shard is internally consistent), value exactness
    // (prices/quantities/dates copied verbatim) and skew shape (each
    // copy reproduces the source's per-key distributions). Dimension
    // keys (l_partkey, l_suppkey, c_nationkey) stay UNCHANGED: facts
    // grow, dimensions don't — the way a real star scales — so
    // per-dimension-key fan-in grows ×N while join/agg structure is
    // preserved. The entity lanes (q108/q218) pair customer names at
    // levenshtein ≤ 1 over EQUAL lengths (⇔ Hamming ≤ 1): copy k ≥ 1
    // appends a DOUBLED copy letter to every name — within a copy the
    // shared tag adds Hamming 0 (pair set identical to the source's),
    // across copies distinct doubled tags add Hamming 2 (and vs copy
    // 0, length +2) — so cross-copy pairs are impossible by
    // construction and the pair structure scales exactly ×N.
    // Disjointness guard mirroring the documents-vocabulary guard
    // above: a source c_name that already ENDS in a used doubled copy
    // letter (e.g. "…aa" when copy 1 tags with "aa") would make an
    // original (copy-0) name equal or Hamming-≤1-adjacent to a tagged
    // copy name, creating cross-copy pairs and breaking the exactly-×N
    // pair-structure invariant asserted below. Name-count-sized work.
    val usedDoubled = "abcdefghijklmnopqrstuvwxyz"
      .slice(letterOffset, letterOffset + copies - 1).map(l => s"$l$l")
    if (usedDoubled.nonEmpty) {
      val nameHits = spark.read.parquet(s"$src/customer.parquet")
        .filter(substring(col("c_name"), -2, 2).isin(usedDoubled: _*))
        .select(col("c_name")).limit(5).collect().map(_.getString(0))
      require(nameHits.isEmpty,
        s"derived-name collision: source c_name(s) ${nameHits.mkString(", ")} " +
          "end in a used doubled copy letter; tagged copies would alias " +
          "originals and the x N entity-pair invariant breaks — use a " +
          "different letterOffset")
    }

    val cust = spark.read.parquet(s"$src/customer.parquet")
      .select(ks, col("*"))
      .select((col("c_custkey") + kL * stride).as("c_custkey"),
        when(col("k") === 0, col("c_name")).otherwise(concat(col("c_name"),
          substring(lit("abcdefghijklmnopqrstuvwxyz"), col("k") + letterOffset, lit(1)),
          substring(lit("abcdefghijklmnopqrstuvwxyz"), col("k") + letterOffset, lit(1))))
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    cust.write.mode("overwrite").parquet(s"$out/customer.parquet")

    val ords = spark.read.parquet(s"$src/orders.parquet")
      .select(ks, col("*"))
      .select((col("o_orderkey") + kL * stride).as("o_orderkey"),
        (col("o_custkey") + kL * stride).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    ords.write.mode("overwrite").parquet(s"$out/orders.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .select(ks, col("*"))
      .select((col("l_orderkey") + kL * stride).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    li.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // dimensions ride along verbatim so every lane's table set resolves
    Seq("region", "nation", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    Seq("documents", "embeddings", "events",
        "customer", "orders", "lineitem").foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"derived $t: $n rows (${copies}x)")
    }
    spark.stop()
  }
}

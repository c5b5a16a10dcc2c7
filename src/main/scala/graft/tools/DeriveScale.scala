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
  *    k·0.001, keeping labels — cell/bucket populations scale ×N.
  *
  * Usage: runMain graft.tools.DeriveScale [srcDir] [outDir] [copies]
  */
object DeriveScale {
  val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/scratch/sf1d")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    require(copies >= 1 && copies <= 26,
      s"copies must be in [1, 26] (one alphabet letter per copy), got $copies")
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
    val usedSuffixes = "abcdefghijklmnopqrstuvwxyz".take(copies - 1)
      .map(l => s"q$l")
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
      .select((col("doc_id") + kL * Stride).as("doc_id"),
        // All-letter suffix ("q" + k-th alphabet letter) keeps derived
        // tokens inside the `^[a-z]+$` word filter the tokenizer lanes
        // (q231/q233/q250/q251) apply, so a 10x corpus really trains
        // them on 10x the vocabulary — while staying disjoint across
        // copies (a "_k" suffix made copies 1..N-1 invisible to them).
        when(col("k") === 0, col("text")).otherwise(array_join(
          transform(split(col("text"), " "),
            t => concat(t, lit("q"),
              substring(lit("abcdefghijklmnopqrstuvwxyz"), col("k"), lit(1)))), " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(ks, col("*"))
      .select((col("vec_id") + kL * Stride).as("vec_id"),
        transform(col("embedding"),
          x => x + col("k").cast("float") * lit(0.001f)).as("embedding"),
        col("label"))
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev0 = graft.sources.Tables.load(spark, src, "events")
    val mm = ev0.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0)
    val (tMin, tMax) = (mm.getLong(0), mm.getLong(1))
    val HourUs = 3600L * 1000000L
    val epochUs = ((tMax - tMin) / HourUs + 2) * HourUs
    val ev = ev0.select(ks, col("*"))
      .select((col("event_id") + kL * Stride).as("event_id"),
        timestamp_micros(unix_micros(col("ts")) + kL * epochUs).as("ts"),
        (col("user_id") + kL * Stride).as("user_id"),
        col("event_type"), col("value"), col("props"))
    ev.write.mode("overwrite").parquet(s"$out/events.parquet")

    Seq("documents", "embeddings", "events").foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"derived $t: $n rows (${copies}x)")
    }
    spark.stop()
  }
}

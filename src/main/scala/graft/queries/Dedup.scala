package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication family for training-data pipelines: exact (hash-groupBy),
  * exact n-gram Jaccard (the quadratic baseline), MinHash+LSH and SimHash
  * (the 100 TB scale paths).
  *
  * All three near-dup variants emit the SAME output contract — candidate
  * pairs verified by EXACT shingle Jaccard ≥ τ — so the approximate
  * algorithms are graded by the same exact DuckDB oracle as the baseline:
  * candidate generation is approximate, the emitted answer is not.
  */
object Dedup {

  private val Tau = 0.6

  /** documents + their word-3-gram shingle sets (shared by all variants). */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))

  /** Exact-verification of candidate pairs: join shingle sets back and
    * compute exact Jaccard as an int-ratio double (bit-identical across
    * engines). Input must have columns d1 < d2.
    */
  private def verifyPairs(cands: DataFrame, docs: DataFrame): DataFrame = {
    val a = docs.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val b = docs.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    cands
      .join(a, "d1").join(b, "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jac") >= Tau)
      .select(col("d1"), col("d2"), col("jac"))
      .orderBy(col("d1"), col("d2"))
  }

  /** The one oracle shared by q40/q41/q42: ground-truth exact-Jaccard pairs. */
  val nearDupPairsSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         range(1, greatest(len(ws) - 1, 1)),
      |         i -> array_to_string(ws[i:i+2], ' '))) AS s FROM w),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
      |          FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sz AS (SELECT doc_id, len(s) AS n FROM sh)
      |SELECT d1, d2, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
      |FROM inter JOIN sz sa ON sa.doc_id = inter.d1
      |           JOIN sz sb ON sb.doc_id = inter.d2
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= $Tau
      |ORDER BY d1, d2""".stripMargin

  /** Exact dedup by content hash: collapse byte-identical texts, keeping
    * the smallest doc_id as the survivor. Input is documents ∪ documents
    * (simulating a re-crawl) so every group genuinely collapses 2→1.
    * At 100 TB: one hash-shuffle on the text (or on md5(text) to keep
    * shuffle keys small) — this IS the scale path for exact dedup.
    */
  def q33ExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    d.unionAll(d)
      .groupBy($"text")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select($"doc_id", $"n_copies", length($"text").cast("long").as("n_chars_live"))
      .orderBy($"doc_id")
  }

  val q33ExactDedupSql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies,
      |  CAST(length(text) AS BIGINT) AS n_chars_live
      |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      |GROUP BY text ORDER BY doc_id""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs — the quadratic baseline: explode
    * shingles, self-join on shingle, count intersections, filter ≥ τ.
    * Correct at any scale but O(candidate²) on hot shingles; q41/q42 are
    * the subquadratic scale paths with identical output.
    */
  def q40NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = shingled(s, dir)
    val ex = docs.select($"doc_id", explode($"sh").as("g"))
    val cands = ex.as("a").join(ex.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    verifyPairs(cands, docs)
  }

  /** MinHash + LSH banding: 64 min-hashes per doc (xxhash64 seeded by slot
    * index, min over shingles — all per-row codegen'd higher-order funcs),
    * 16 bands × 4 rows hashed to a bucket key, candidates = pairs sharing
    * any band bucket, then exact-Jaccard verification. At 100 TB the only
    * shuffle is on (band, bucket) — subquadratic, skew-bounded by band
    * width; miss probability for a 0.9-Jaccard pair is (1-0.9⁴)^16 ≈ 4e-8.
    */
  def q41MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = shingled(s, dir)
    val sig = docs.withColumn("sig",
      expr("transform(sequence(0, 63), k -> array_min(transform(sh, g -> xxhash64(k, g))))"))
    val bands = sig.select($"doc_id",
        explode(expr(
          "transform(sequence(0, 15), b -> struct(b AS band, xxhash64(slice(sig, b*4+1, 4)) AS bucket))"))
          .as("bb"))
      .select($"doc_id", $"bb.band", $"bb.bucket")
    val cands = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    verifyPairs(cands, docs)
  }

  /** SimHash near-dup: 64-bit signature (per-bit majority vote over shingle
    * xxhash64 bits), banded into 13 ~5-bit blocks — any-block-equal
    * candidates, which by pigeonhole catches every pair with Hamming
    * distance ≤ 12, then exact-Jaccard verification. Same shuffle shape as
    * q41. Block width trades recall for bucket selectivity: short docs
    * (tens of shingles) have noisy signatures (Hamming up to ~10 for
    * 0.9-Jaccard pairs here), so blocks are narrow; long-document corpora
    * can use the classic 4×16-bit tables (Hamming ≤ 3) for much sharper
    * buckets at scale.
    */
  def q42Simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = shingled(s, dir)
    val sim = docs
      .withColumn("hs", expr("transform(sh, g -> xxhash64(g))"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, k) -> acc | shiftleft(
          |  CASE WHEN aggregate(hs, 0L,
          |    (votes, h) -> votes + CASE WHEN (shiftright(h, k) & 1) = 1 THEN 1 ELSE -1 END) > 0
          |  THEN 1L ELSE 0L END, k))""".stripMargin))
    val chunks = sim.select($"doc_id",
        explode(expr(
          """transform(sequence(0, 12), c -> struct(c AS chunk,
            |  shiftright(simhash, cast(c*64 div 13 AS int))
            |    & (shiftleft(1L, cast((c+1)*64 div 13 - c*64 div 13 AS int)) - 1) AS cv))""".stripMargin))
          .as("cc"))
      .select($"doc_id", $"cc.chunk", $"cc.cv")
    val cands = chunks.as("a").join(chunks.as("b"),
        $"a.chunk" === $"b.chunk" && $"a.cv" === $"b.cv" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    verifyPairs(cands, docs)
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q268 SemDedup: hand-computed prune manifests on constructed
  * clustered corpora (including the one-pass dominated-prune chain
  * semantics), the full-probe ≡ brute-all-pairs law on sf0.001, and
  * the soundness + recall grade of the single-assignment cluster-local
  * configuration (the paper's actual scale path).
  */
class SemDedupSpec extends SparkSpec {

  private val Dim = 64

  /** Unit vector along axis `ax`, optionally mixed with axis `ax2` by
    * angle weight w (unnormalized is fine — cosine normalizes).
    */
  private def vec(ax: Int, ax2: Int = -1, w: Float = 0f): Array[Float] = {
    val v = new Array[Float](Dim)
    v(ax) = 1f
    if (ax2 >= 0) v(ax2) = w
    v
  }

  private def writeEmb(rows: Seq[(Long, Array[Float], String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-semdedup").toString
    rows.map { case (id, e, l) => (id, e.toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def manifest(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Brute all-pairs reference manifest built with the SAME pipeline
    * primitives minus the bucketing: ground truth for the full-probe
    * law and the recall denominators.
    */
  private def bruteManifest(dir: String, tau: Double): Seq[(Long, Long)] = {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val a = e.select($"vec_id".as("d1"), $"embedding".as("x"))
    val b = e.select($"vec_id".as("d2"), $"embedding".as("y"))
    val w = Window.partitionBy($"d2").orderBy($"d1")
    a.crossJoin(b).filter($"d1" < $"d2")
      .withColumn("c", call_function("cosine_similarity", $"x", $"y"))
      .filter($"c" >= tau)
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"d2", $"d1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("hand-computed manifest: two near-dup groups and a singleton") {
    // group A: ids 1,2,3 along axis 0 (pairwise cos ≈ 1); group B:
    // ids 10,11 along axis 1; singleton id 20 on axis 2 (cross cos 0).
    // keep-rule = smallest vec_id → 1 and 10 survive, 20 untouched.
    val tmp = writeEmb(Seq(
      (1L, vec(0), "a"), (2L, vec(0, 3, 0.05f), "a"), (3L, vec(0, 4, 0.05f), "a"),
      (10L, vec(1), "b"), (11L, vec(1, 5, 0.05f), "b"),
      (20L, vec(2), "c")))
    val got = Similarity.q268SemDedup(spark, tmp, nCells = 4, nAssign = 4)
    assert(manifest(got) == Seq((2L, 1L), (3L, 1L), (11L, 10L)))
    // every manifest cosine is a real τ-survivor
    assert(got.collect().forall(_.getDouble(2) >= 0.45))
  }

  test("one-pass dominated prune: a pruned vector still dominates later ones (the paper's semantics, not transitive greedy)") {
    // chain: a=1 on axis 0, c=3 on axis 1, b=2 = (a+c)/√2.
    // cos(a,b) = cos(b,c) ≈ 0.707 ≥ τ; cos(a,c) = 0 < τ.
    // b is pruned by a; c is pruned by b EVEN THOUGH b is pruned.
    val tmp = writeEmb(Seq(
      (1L, vec(0), "x"), (2L, vec(0, 1, 1f), "x"), (3L, vec(1), "x")))
    val got = manifest(Similarity.q268SemDedup(spark, tmp, nCells = 2, nAssign = 2))
    assert(got == Seq((2L, 1L), (3L, 2L)))
  }

  test("full-probe law on sf0.001: the registered configuration equals the brute all-pairs manifest") {
    val dir = "/root/testdata/sf0.001"
    val got = manifest(Similarity.q268SemDedup(spark, dir)).sorted
    assert(got == bruteManifest(dir, 0.45))
  }

  test("pruned configurations: sound (never prune a non-duplicate), recall graded on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val truth = bruteManifest(dir, 0.45).map(_._1).toSet
    // soundness holds for ANY assignment: pairs are exact-verified
    // after candidate generation, so every pruned id has a genuine
    // earlier τ-neighbor — a recall miss is the only possible error
    // mode. Grade the worst case (single assignment on this ISOTROPIC
    // corpus, where τ=0.45 pairs sit at the random-cosine noise floor
    // — the q43 envelope note: measured recall 0/7 at C=8, a=1) and a
    // half-cost configuration (a=3 vs the registered full-recall a=7;
    // measured recall 7/7 at C=32 — the sweep: a=2 ≥ 4/7, a≥3 ≥ 6/7
    // at every C ∈ {8,16,32}).
    val worst = manifest(
      Similarity.q268SemDedup(spark, dir, nCells = 8, nAssign = 1))
    assert(worst.map(_._1).toSet.subsetOf(truth))
    val half = manifest(
      Similarity.q268SemDedup(spark, dir, nCells = 32, nAssign = 3))
    assert(half.map(_._1).toSet.subsetOf(truth))
    val recall = half.map(_._1).toSet.size.toDouble / truth.size
    assert(recall >= 0.5, s"half-cost (C=32, a=3) recall collapsed: $recall")
  }

  test("single-assignment recall is 1.0 on a clustered corpus (the SemDedup design point)") {
    // two tight, well-separated clusters with 4 members each — k-means
    // with C=2 converges to one centroid per cluster from any seeding
    // the deterministic hash-order sample produces, so single
    // assignment co-locates every true pair.
    val tmp = writeEmb(
      (0 until 4).map(i => (i + 1L, vec(0, 3 + i, 0.04f), "a")) ++
      (0 until 4).map(i => (i + 11L, vec(1, 10 + i, 0.04f), "b")))
    val got = manifest(
      Similarity.q268SemDedup(spark, tmp, nCells = 2, nAssign = 1))
    assert(got == Seq((2L, 1L), (3L, 1L), (4L, 1L),
      (12L, 11L), (13L, 11L), (14L, 11L)))
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q148 sorted-neighborhood blocking, q149 water-filling allocation,
  * q150 nearest-centroid purity: closed-form fixtures where the exact
  * answer is hand-computable, plus contract checks on real data.
  */
class BlockingAllocationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q148: emitted pairs are true pairs, and recall is near-total") {
    import spark.implicits._
    val snm = Dedup.q148SortedNeighborhood(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val exact = Dedup.q40NgramJaccard(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    // SNM is approximate BY CONTRACT: a true pair whose min-shingles
    // differ can sort farther than w apart and is skipped (here: one
    // such miss in 27 true pairs at sf0.001; zero at sf0.01). Every
    // emitted pair must be a true pair, and recall must stay near 1.
    assert(snm.subsetOf(exact) && snm.nonEmpty)
    assert(snm.size.toDouble / exact.size >= 0.9)
  }

  test("q148: jaccard values match the exact baseline on shared pairs") {
    import spark.implicits._
    val snm = Dedup.q148SortedNeighborhood(spark, dir)
      .select($"d1", $"d2", $"jac").as[(Long, Long, Double)].collect().toMap2
    val exact = Dedup.q40NgramJaccard(spark, dir)
      .select($"d1", $"d2", $"jac").as[(Long, Long, Double)].collect().toMap2
    assert(snm.forall { case (k, j) => exact.get(k).contains(j) })
  }

  test("q148: pair set is invariant under the range-partition count") {
    import spark.implicits._
    val p4 = Dedup.q148SortedNeighborhood(spark, dir, parts = 4)
      .select($"d1", $"d2", $"jac").as[(Long, Long, Double)].collect().toSeq
    val p32 = Dedup.q148SortedNeighborhood(spark, dir, parts = 32)
      .select($"d1", $"d2", $"jac").as[(Long, Long, Double)].collect().toSeq
    assert(p4 == p32 && p4.nonEmpty)
  }

  private implicit class Triples(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map { case (a, b, j) => (a, b) -> j }.toMap
  }

  test("q149: hand-computed water level on supplies 10/20/70, budget 40") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wf").toString
    def doc(id: Long, src: String, n: Int) =
      (id, src, Seq.fill(n)("tok").mkString(" "))
    Seq(doc(1, "a", 10), doc(2, "b", 20), doc(3, "c", 70))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // B = floor(100 * 2/5) = 40; sorted asc: a funded (10*3=30 <= 40),
    // b unfunded (20*2=40 > 30 left) -> lambda = (40-10)/2 = 15
    val rows = Sampling.q149Waterfill(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Double]("alloc"),
          r.getAs[Double]("weight"))).toMap
    assert(rows("a") == ((10L, 10.0, 1.0)))
    assert(rows("b") == ((20L, 15.0, 0.75)))
    assert(rows("c")._2 == 15.0)
    assert(rows.values.map(_._2).sum == 40.0)
  }

  test("q149: real data — allocations sum to the budget, weights <= 1") {
    import spark.implicits._
    val rows = Sampling.q149Waterfill(spark, dir).collect()
    val total = graft.sources.Tables.load(spark, dir, "documents")
      .select(sum(size(split($"text", " ")))).as[Long].head()
    val b = total * 2 / 5
    assert(math.abs(rows.map(_.getAs[Double]("alloc")).sum - b) < 1e-6)
    assert(rows.forall(_.getAs[Double]("weight") <= 1.0 + 1e-12))
  }

  test("q150: separated clusters are pure; a planted defector is counted") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cp").toString
    def vec(id: Long, base: Float, label: Int) =
      (id, Array(base, base + 1.0f, 0.0f, 0.0f), label)
    // label 0 clusters near 0, label 1 near 100; vec 6 is labeled 1 but
    // sits in label 0's cluster -> exactly one defector in label 1
    Seq(vec(1, 0.0f, 0), vec(2, 0.5f, 0), vec(3, 1.0f, 0),
      vec(4, 100.0f, 1), vec(5, 100.5f, 1), vec(6, 0.2f, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.q150CentroidPurity(spark, tmp).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_impure"))).toMap
    assert(rows(0) == ((3L, 0L)))
    assert(rows(1) == ((3L, 1L)))
  }

  test("q150: real data — every vector assigned, purity in [0, 1]") {
    val rows = Similarity.q150CentroidPurity(spark, dir).collect()
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n)
    assert(rows.forall { r =>
      val p = r.getAs[Double]("purity"); p >= 0.0 && p <= 1.0
    })
  }
}

package graft.queries

import graft.SparkSpec

/** q261 binary-quantization ANN: the reported Hamming distances match
  * an independent plain-Scala sign-code builder on the raw embeddings,
  * distances stay in [0, 64], and each query's rerank block is a
  * correctly ordered top-K by exact cosine.
  */
class AnnBinarySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def refCode(emb: Seq[Float]): (Long, Long) = {
    def half(h: Int): Long = (0 until 32).map { i =>
      if (emb(32 * h + i) > 0f) 1L << i else 0L
    }.sum
    (half(0), half(1))
  }

  test("hamming distances match the independent sign-code reference") {
    import spark.implicits._
    val rows = Similarity.q261AnnBinaryHamming(spark, dir).collect()
    assert(rows.nonEmpty)
    val embs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val (qid, nid, ham) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val (q0, q1) = refCode(embs(qid))
      val (c0, c1) = refCode(embs(nid))
      val ref = java.lang.Long.bitCount(q0 ^ c0) + java.lang.Long.bitCount(q1 ^ c1)
      assert(ham == ref.toLong, s"hamming($qid,$nid)")
      assert(ham >= 0L && ham <= 64L)
    }
  }

  test("each query block is rnk 1..K ordered by exact cosine descending") {
    val rows = Similarity.q261AnnBinaryHamming(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"q$qid ranks")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq,
        s"q$qid cosine order")
    }
  }

  test("q262 full probe is provably q261's answer (every cell probed = global shortlist)") {
    val brute = Similarity.q261AnnBinaryHamming(spark, dir).collect().map(_.toSeq).toSeq
    val ivf = Similarity.q262AnnBinaryIvfFullProbe(spark, dir).collect().map(_.toSeq).toSeq
    assert(ivf == brute)
  }

  test("q262 pruned probe (nProbe < C) stays well-formed and finds real neighbors") {
    val rows = Similarity.q262AnnBinaryIvf(spark, dir, nCells = 8, nProbe = 2)
      .collect()
    assert(rows.nonEmpty)
    val brute = Similarity.q261AnnBinaryHamming(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.length <= 3, s"q$qid block size")
      assert(rs.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 64L))
    }
    // pruned recall vs the global hamming shortlist: at nProbe=2/8 the
    // probe still covers the query's own neighborhood cells — demand a
    // non-trivial overlap rather than a corpus-dependent exact bar
    val overlap = rows.count(r => brute((r.getLong(0), r.getLong(2))))
    assert(overlap.toDouble / rows.length > 0.2,
      s"pruned-probe overlap with the global shortlist: $overlap/${rows.length}")
  }
}

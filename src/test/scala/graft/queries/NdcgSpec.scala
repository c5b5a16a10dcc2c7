package graft.queries

import graft.SparkSpec

/** q264 nDCG@10: an independent plain-Scala replication (exact cosine
  * ranking, log2 discounting, ideal from the true relevant count) on
  * the test corpus, plus the metric's range law.
  */
class NdcgSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 10

  test("matches a plain-Scala replication on the test corpus") {
    import spark.implicits._
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ln2 = math.log(2.0)
    val labCount = vecs.groupBy(_._3).view.mapValues(_.length).toMap
    val perQuery = vecs.filter(_._1 % 100 == 0).flatMap { case (qid, qe, ql) =>
      val top = vecs.filter(_._1 != qid)
        .map { case (nid, ne, nl) => (nid, nl, cos(qe, ne)) }
        .sortBy(t => (-t._3, t._1)).take(K)
      val dcg = top.zipWithIndex.map { case ((_, nl, _), i) =>
        (if (nl == ql) 1.0 else 0.0) * ln2 / math.log(i + 2.0) }.sum
      val r = math.min(labCount(ql) - 1, K)
      if (r <= 0) None
      else Some((ql, dcg / (1 to r).map(i => ln2 / math.log(i + 1.0)).sum))
    }
    val expected = perQuery.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, (g.map(_._2).sum / g.length).toFloat))
      .toMap
    val got = ModelEval.q264Ndcg(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getFloat(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (lab, (n, m)) =>
      assert(n == expected(lab)._1, s"label $lab query count")
      assert(math.abs(m - expected(lab)._2) < 1e-5f, s"label $lab mean nDCG")
    }
  }

  test("nDCG stays in [0, 1]") {
    val rows = ModelEval.q264Ndcg(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getFloat(2)
      assert(m >= 0f && m <= 1f, s"label ${r.getInt(0)}: $m")
    }
  }
}

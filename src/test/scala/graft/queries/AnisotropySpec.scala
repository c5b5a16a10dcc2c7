package graft.queries

import graft.SparkSpec

/** q266 embedding anisotropy: an independent plain-Scala replication
  * of the quantized one-scan report on the test corpus, plus the
  * ratio's range law and the ROLLUP overall row.
  */
class AnisotropySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ref(vecs: Seq[Array[Float]]): (Long, Float, Float, Float) = {
    val n = vecs.length.toLong
    val snq = vecs.map { v =>
      math.floor(math.sqrt(v.map(x => x.toDouble * x).sum) * 1e6).toLong }.sum
    val dims = vecs.head.length
    val sums = (0 until dims).map(d =>
      vecs.map(v => math.floor(v(d).toDouble * 1e6).toLong).sum)
    val mu2 = sums.foldLeft(0.0) { (acc, sd) =>
      val t = sd.toDouble / n / 1e6; acc + t * t }
    val meanNorm = snq.toDouble / n / 1e6
    (n, meanNorm.toFloat, math.sqrt(mu2).toFloat,
      (math.sqrt(mu2) / meanNorm).toFloat)
  }

  test("matches the plain-Scala quantized replication per label and overall") {
    import spark.implicits._
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"label", $"embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val expected = (vecs.groupBy(_._1).map { case (l, g) =>
      l -> ref(g.map(_._2).toSeq) } +
      (-1 -> ref(vecs.map(_._2).toSeq)))
    val got = Similarity.q266Anisotropy(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getFloat(2), r.getFloat(3), r.getFloat(4)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (l, v) => assert(v == expected(l), s"label $l") }
  }

  test("anisotropy is a ratio in [0, 1] and the mean vector is never longer than the mean norm") {
    val rows = Similarity.q266Anisotropy(spark, dir).collect()
    assert(rows.map(_.getInt(0)).contains(-1))
    rows.foreach { r =>
      val (mn, mu, a) = (r.getFloat(2), r.getFloat(3), r.getFloat(4))
      assert(mu <= mn * 1.000001f, s"label ${r.getInt(0)}: Jensen violated")
      assert(a >= 0f && a <= 1.000001f)
    }
  }
}

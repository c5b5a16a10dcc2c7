package graft.queries

import graft.SparkSpec

/** q236 power-iteration invariants that are NOT circular with the
  * oracle twin: the emitted direction is unit-norm, the explained
  * share is a valid interior fraction, and — the property that makes
  * it a PRINCIPAL direction — its Rayleigh quotient beats the uniform
  * start vector's on an independent local recompute.
  */
class PcaPowerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q236: unit direction, interior explained share, Rayleigh beats the start vector") {
    import spark.implicits._
    val rows = Similarity.q236PcaPower(spark, dir).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getAs[Long]("k")).toSeq == (1L to 64L))
    val v = rows.sortBy(_.getAs[Long]("k")).map(_.getAs[Float]("component").toDouble)
    assert(math.abs(v.map(c => c * c).sum - 1.0) < 1e-4)
    val explained = rows.head.getAs[Float]("explained_pct").toDouble
    assert(explained > 0.0 && explained < 1.0)
    assert(rows.forall(r => r.getAs[Float]("explained_pct").toDouble == explained))

    // independent local recompute of the Rayleigh quotient v'X'Xv / tr(X'X)
    val xs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
    def rayleigh(dirV: Array[Double]): Double = {
      var num = 0.0; var den = 0.0
      xs.foreach { x =>
        var dot = 0.0; var n2 = 0.0; var i = 0
        while (i < x.length) { dot += x(i) * dirV(i); n2 += x(i).toDouble * x(i); i += 1 }
        num += dot * dot; den += n2
      }
      num / den
    }
    val uniform = Array.fill(64)(0.125)
    val rFinal = rayleigh(v)
    val rStart = rayleigh(uniform)
    assert(rFinal > rStart,
      s"power iteration must increase the Rayleigh quotient: $rFinal vs $rStart")
    // the emitted explained share is the quantized version of the same quotient
    assert(math.abs(explained - rFinal) < 1e-3)
  }
}

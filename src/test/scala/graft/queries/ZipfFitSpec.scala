package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q263 Zipf rank–frequency fit: an independent plain-Scala OLS on a
  * hand-built corpus with exact Zipfian counts, plus the slope-sign
  * law on the test corpus.
  */
class ZipfFitSpec extends SparkSpec {

  /** Reference OLS of ln(freq) on ln(rank), sums folded in rank order. */
  private def refFit(freqs: Seq[Long]): (Float, Float) = {
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble)) }
    val n = pts.size.toDouble
    val (sx, sy, sxy, sxx) = pts.foldLeft((0.0, 0.0, 0.0, 0.0)) {
      case ((a, b, c, d), (x, y)) => (a + x, b + y, c + x * y, d + x * x) }
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (slope.toFloat, ((sy - slope * sx) / n).toFloat)
  }

  test("matches the plain-Scala OLS on an exact-Zipf corpus, slope near -1") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-zipf").toString
    // word w_i appears floor(60/i) times, i = 1..10 — exact Zipf counts
    // (letter-only tokens: the query's ^[a-z]+$ filter must keep them)
    val counts = (1 to 10).map(i => ("w" + ('a' + i - 1).toChar, (60 / i).toLong))
    val text = counts.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
    Seq((0L, text, "s1")).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val (slope, intercept) = refFit(counts.map(_._2))
    val row = TextOps.q263ZipfFit(spark, tmp).collect().head
    assert(row.getString(0) == "s1" && row.getLong(1) == 10L)
    assert(row.getFloat(2) == slope && row.getFloat(3) == intercept)
    assert(slope < -0.8f && slope > -1.2f, s"exact-Zipf slope $slope")
  }

  test("every source's fitted slope is negative on the test corpus") {
    val rows = TextOps.q263ZipfFit(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getFloat(2) < 0f, s"${r.getString(0)} slope")
      assert(r.getLong(1) > 0L)
    }
  }
}

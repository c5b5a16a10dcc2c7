package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q258 CCNet perplexity bucketing: an independent plain-Scala
  * reference (add-one bigram LM in reading order, interpolated
  * per-source terciles, head/middle/tail classification) reproduced
  * exactly, plus the structural laws — buckets partition each source's
  * scored docs, head scores dominate tail scores.
  */
class CcnetBucketsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ccnet").toString
    rows.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Reference scoring: q104's add-one-smoothed bigram mean logprob,
    * float-presented.
    */
  private def score(corpus: Seq[String], doc: String): Option[Float] = {
    val allWords = corpus.flatMap(_.split(" "))
    val uni = allWords.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val v = uni.size.toLong
    val bigs = corpus.flatMap(t => t.split(" ").toSeq.sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")))
    val big = bigs.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val ws = doc.split(" ").toSeq
    if (ws.size < 2) None
    else {
      val terms = ws.sliding(2).filter(_.size == 2).map { p =>
        math.log((big(p.mkString(" ")) + 1.0) / (uni(p.head) + v))
      }.toSeq
      Some((terms.foldLeft(0.0)(_ + _) / terms.size).toFloat)
    }
  }

  /** Interpolated p-quantile (Spark exact percentile / DuckDB
    * quantile_cont): pos = p(n-1) on the ascending sort.
    */
  private def quantile(xs: Seq[Float], p: Double): Double = {
    val s = xs.sorted.map(_.toDouble)
    val pos = p * (s.size - 1)
    val lo = pos.toInt
    if (lo + 1 >= s.size) s(lo)
    else s(lo) + (s(lo + 1) - s(lo)) * (pos - lo)
  }

  test("matches the plain-Scala reference on a two-source corpus") {
    // s1: six docs built from a shared bigram pool so scores spread;
    // s2: three docs, one per bucket by construction
    val rows = Seq(
      (0L, "a b a b a b", "s1"),
      (1L, "a b a b", "s1"),
      (2L, "a b c d", "s1"),
      (3L, "c d c d", "s1"),
      (4L, "e f g h", "s1"),
      (5L, "h g f e", "s1"),
      (6L, "a b a b a b a b", "s2"),
      (7L, "a b c d e f", "s2"),
      (8L, "q r s t", "s2"))
    val tmp = writeDocs(rows)
    val corpus = rows.map(_._2)
    val scored = rows.flatMap { case (id, t, src) =>
      score(corpus, t).map(f => (src, t.split(" ").length.toLong, f)) }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val p33 = quantile(ds.map(_._3), 1.0 / 3)
      val p66 = quantile(ds.map(_._3), 2.0 / 3)
      ds.map { case (_, nw, lp) =>
        val b = if (lp > p66) "head" else if (lp <= p33) "tail" else "middle"
        (src, b, nw, lp)
      }.groupBy(t => (t._1, t._2)).toSeq.map { case ((s2, b), g) =>
        (s2, b, g.size.toLong, g.map(_._3).sum,
          g.map(_._4).min, g.map(_._4).max)
      }
    }.sortBy(t => (t._1, t._2))
    val got = LangModel.q258CcnetBuckets(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getFloat(4), r.getFloat(5))).toSeq
    assert(got == expected)
  }

  test("buckets partition each source and head scores dominate tail scores") {
    val tmp = "/root/testdata/sf0.001"
    val got = LangModel.q258CcnetBuckets(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getFloat(4), r.getFloat(5)))
    val bySrc = got.groupBy(_._1)
    bySrc.foreach { case (src, rs) =>
      val m = rs.map(r => r._2 -> r).toMap
      // every bucket present and internally ordered: tail's best <=
      // middle's worst boundary <= head's worst
      assert(m.keySet == Set("head", "middle", "tail"), src)
      assert(m("tail")._5 <= m("middle")._4 || m("middle")._3 == 0L)
      assert(m("middle")._5 <= m("head")._4)
      // terciles: no bucket is more than half the source's docs (loose
      // structural sanity; exact sizes depend on score ties)
      val n = rs.map(_._3).sum
      rs.foreach(r => assert(r._3 <= (n + 1) / 2, s"$src ${r._2}"))
    }
  }
}

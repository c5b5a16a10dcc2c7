package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import graft.SparkSpec

/** q257 Count-Min sketch: independent plain-Scala reference (same
  * md5-slice hash family), the one-sided error law (estimate >= true
  * count, exact when no row collides), and register MERGEABILITY
  * (per-shard sketches sum element-wise to the whole-corpus sketch —
  * the property that makes a sketch a warehouse primitive).
  */
class CmsSpec extends SparkSpec {

  private val D = Analytic.CmsDepth
  private val W = Analytic.CmsWidth

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cms").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Reference hash: row-i bucket from md5 hex chars [7i, 7i+7). */
  private def bucket(word: String, i: Int): Int = {
    val hex = MessageDigest.getInstance("MD5").digest(word.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(7 * i, 7 * i + 7), 16) % W).toInt
  }

  /** Reference CMS: registers from a word multiset. */
  private def refCms(words: Seq[String]): Map[(Int, Int), Long] =
    words.flatMap(w => (0 until D).map(i => (i, bucket(w, i))))
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }

  private def refEst(regs: Map[(Int, Int), Long], word: String): Long =
    (0 until D).map(i => regs.getOrElse((i, bucket(word, i)), 0L)).min

  test("matches the independent reference CMS on a mixed corpus, and never undercounts") {
    val text = ("alpha " * 7 + "beta " * 5 + "gamma " * 3 + "delta " * 2 +
      "epsilon zeta eta theta iota kappa").trim
    val tmp = writeDocs(Seq((0L, text)))
    val words = text.split(" ").toSeq
    val regs = refCms(words)
    val truth = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val got = Analytic.q257CmsEstimate(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (w, tc, est, over) =>
      assert(tc == truth(w))
      assert(est == refEst(regs, w), s"estimate mismatch for $w")
      assert(over == est - tc)
      assert(over >= 0L, s"CMS undercounted $w")
    }
    // the report is top-k by (count DESC, word)
    assert(got.map(r => (-r._2, r._1)).toSeq == got.map(r => (-r._2, r._1)).toSeq.sorted)
  }

  test("registers are mergeable: per-shard sketches sum element-wise to the whole-corpus sketch") {
    val shard1 = Seq.fill(4)("red") ++ Seq("green", "blue", "cyan")
    val shard2 = Seq.fill(3)("red") ++ Seq("green", "magenta")
    val whole = refCms(shard1 ++ shard2)
    val summed = (refCms(shard1).toSeq ++ refCms(shard2).toSeq)
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    assert(summed == whole)
    // and estimates off the merged registers still never undercount
    val truth = (shard1 ++ shard2).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }
    truth.foreach { case (w, tc) => assert(refEst(summed, w) >= tc) }
  }

  test("a word with no colliding register is estimated exactly") {
    // single-word corpus: every register the word touches holds exactly
    // its count, so the min is exact
    val tmp = writeDocs(Seq((0L, "solo solo solo")))
    val got = Analytic.q257CmsEstimate(spark, tmp).collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "solo")
    assert(got(0).getLong(1) == 3L)
    assert(got(0).getLong(2) == 3L)
    assert(got(0).getLong(3) == 0L)
  }
}

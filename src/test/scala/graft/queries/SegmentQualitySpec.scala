package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q294 per-segment LM quality filter: hand-model equality on a
  * constructed corpus (segments, add-one bigram scores, nearest-rank
  * median, reassembly) plus the filter's defining invariants.
  */
class SegmentQualitySpec extends SparkSpec {

  // w = 4: multi-segment docs with a truncated tail and a 1-word
  // (unscorable) segment; the repeated boilerplate phrase scores HIGH
  // (its bigrams are frequent) and prose scores low — the filter keeps
  // the frequent half, which is exactly what median-thresholding on an
  // add-one model does (CCNet pairs it with the head/tail bucket
  // convention; the operator exposes the threshold mechanics)
  private val texts = Seq(
    (1L, "the quick brown fox jumps over a lazy dog"),   // 9 words: 4+4+1
    (2L, "click here to subscribe click here to subscribe"), // 8: 4+4 dup segs
    (3L, "click here to subscribe the quick brown fox"),  // 8: 4+4
    (10L, "a b c d e f g h"))                             // 8: distinct rare words

  private def model(w: Int = 4) = {
    val uni = texts.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, o) => (t, o.size.toLong) }
    val v = uni.size.toLong
    val big = texts.flatMap { case (_, t) =>
      val ws = t.split(" "); ws.dropRight(1).zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    def segsOf(t: String) = t.split(" ").grouped(w).map(_.mkString(" ")).toSeq
    val segs = texts.flatMap { case (id, t) =>
      segsOf(t).zipWithIndex.map { case (s, i) => (id, i + 1L, s) }
    }
    def score(s: String): Option[Float] = {
      val ws = s.split(" ")
      if (ws.length < 2) None
      else {
        val lps = ws.dropRight(1).zip(ws.drop(1)).map { case (a, b) =>
          math.log((big(s"$a $b") + 1.0) / (uni(a) + v))
        }
        Some((lps.sum / lps.length).toFloat)
      }
    }
    val scored = segs.flatMap { case (id, no, s) => score(s).map((id, no, s, _)) }
    val sorted = scored.map(_._4).sorted
    val median = sorted((sorted.length + 1) / 2 - 1) // nearest-rank, 1-based
    (segs, scored.map(r => (r._1, r._2) -> r._4).toMap, median)
  }

  test("q294 matches the hand model: scores, median threshold, reassembly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-segq").toString
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val (segs, scores, median) = model()
    val keep = segs.map { case (id, no, s) =>
      (id, no, s, scores.get((id, no)).forall(_ >= median))
    }
    val want = keep.groupBy(_._1).map { case (id, g) =>
      val sorted = g.sortBy(_._2)
      id -> (g.size.toLong,
        g.count(r => scores.contains((r._1, r._2))).toLong,
        g.count(_._4).toLong,
        sorted.filter(_._4).map(_._3).mkString(" "))
    }
    val got = LangModel.q294SegmentQualityFilter(spark, tmp, w = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(got == want, s"\ngot  $got\nwant $want\nmedian $median")
    // the invariants the operator exists for: at least half the scored
    // segments survive (median threshold), unscorable segments survive,
    // and SOMETHING was dropped (the filter is live on this corpus)
    val scoredN = keep.count(r => scores.contains((r._1, r._2)))
    val keptScored = keep.count(r => r._4 && scores.contains((r._1, r._2)))
    assert(keptScored * 2 >= scoredN)
    assert(keep.filter(r => !scores.contains((r._1, r._2))).forall(_._4))
    assert(keep.exists(!_._4))
  }
}

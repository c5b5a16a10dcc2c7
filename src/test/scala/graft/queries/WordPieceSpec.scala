package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q255 WordPiece training: hand-computed merge sequences on
  * micro-corpora — the likelihood score count(ab)/(count(a)·count(b))
  * picking a DIFFERENT merge than BPE's raw pair count, the quantized
  * micro-nat score values, deterministic tie-break — plus an
  * independent plain-Scala reference replay over a larger corpus, and
  * the q256 encode report.
  */
class WordPieceSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wp").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def run(tmp: String, rounds: Int): Seq[(Long, String, String, String, Long, Long)] =
    LangModel.q255WordPieceTrain(spark, tmp, rounds).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq

  private def q(pc: Long, ca: Long, cb: Long): Long =
    math.floor((math.log(pc.toDouble) - math.log(ca.toDouble)
      - math.log(cb.toDouble)) * 1e6).toLong

  test("likelihood score beats raw frequency: a rare exclusive pair outranks a frequent pair of frequent symbols") {
    // words: ab×4, a×8, xy×2.
    // round 1 symbol counts: a=12, b=4, x=2, y=2;
    //   pairs: (a,b)=4 score 4/(12·4)=1/12, (x,y)=2 score 2/(2·2)=1/2.
    // BPE would merge (a,b) (count 4 > 2); WordPiece merges (x,y).
    // round 2: only (a,b)=4 remains (counts a=12, b=4).
    val tmp = writeDocs(Seq(
      (0L, "ab ab ab ab a a a a"), (1L, "a a a a xy xy")))
    assert(run(tmp, 2) == Seq(
      (1L, "x", "y", "xy", 2L, q(2, 2, 2)),
      (2L, "a", "b", "ab", 4L, q(4, 12, 4))))
  }

  test("tie-break is (qscore DESC, lhs, rhs) — lexicographic smallest pair wins an exact score tie") {
    // "bc" and "de" once each: all symbols count 1, both scores 1/1
    // (qscore 0) — tie broken to (b,c)
    val tmp = writeDocs(Seq((0L, "bc de")))
    assert(run(tmp, 1) == Seq((1L, "b", "c", "bc", 1L, 0L)))
  }

  test("merge application is greedy left-to-right non-overlapping (aaa counts 2, applies once)") {
    // "aaa": pair (a,a) positional count 2, symbol count a=3;
    //   qscore = floor((ln2 − 2·ln3)·1e6); apply → aa|a|
    // round 2: (aa,a)=1, counts aa=1, a=1 → qscore 0
    val tmp = writeDocs(Seq((0L, "aaa")))
    assert(run(tmp, 2) == Seq(
      (1L, "a", "a", "aa", 2L, q(2, 3, 3)),
      (2L, "aa", "a", "aaa", 1L, q(1, 1, 1))))
  }

  test("merge application is boundary-anchored: a later merge whose lhs is the SUFFIX of an earlier merged symbol does not fire across the boundary") {
    // corpus: "ab"×4, "bc"×2, "abc"×1, "c"×10.
    // round 1 counts a=5, b=7, c=13: (a,b)=5 score 1/7 beats
    //   (b,c)=3 score 3/91 → merge ab; "abc" → [ab, c]
    // round 2 counts ab=5, b=2, c=13: (b,c)=2 score 1/13 beats
    //   (ab,c)=1 score 1/65 → merge bc. An UNANCHORED replace of
    //   "b|c|" would also fire inside "ab|c|" (lhs b = suffix of
    //   symbol ab), corrupting "abc" to [abc] though the pair (b,c)
    //   is absent — and round 3 would then emit NO row.
    // round 3 (anchored): (ab,c)=1 from the intact [ab, c] → merge
    //   (counts ab=5, c=11 — round 2 consumed the two "bc" words' c).
    val tmp = writeDocs(Seq(
      (0L, Seq.fill(4)("ab").mkString(" ")),
      (1L, Seq.fill(2)("bc").mkString(" ")),
      (2L, "abc " + Seq.fill(10)("c").mkString(" "))))
    assert(run(tmp, 3) == Seq(
      (1L, "a", "b", "ab", 5L, q(5, 5, 7)),
      (2L, "b", "c", "bc", 2L, q(2, 2, 13)),
      (3L, "ab", "c", "abc", 1L, q(1, 5, 11))))
  }

  test("exhausted vocabulary produces no merge row (the q231 convention)") {
    val tmp = writeDocs(Seq((0L, "ab ab")))
    // round 1 merges (a,b); round 2 has no adjacent pairs → 1 row only
    assert(run(tmp, 2).map(_._1) == Seq(1L))
  }

  test("matches an independent plain-Scala reference for 5 rounds on a mixed corpus") {
    val text0 = "the quick brown fox jumps over the lazy dog the end"
    val text1 = "the them then there these those the other though"
    val tmp = writeDocs(Seq((0L, text0), (1L, text1)))
    // reference: freq-weighted distinct words, symbols as string lists
    var vocab: Map[String, (List[String], Long)] =
      (text0.split(" ") ++ text1.split(" ")).toSeq
        .groupBy(identity).map { case (w, g) =>
          (w, (w.map(_.toString).toList, g.size.toLong)) }
    val expected = (1 to 5).flatMap { r =>
      val sym = vocab.values.toSeq
        .flatMap { case (ss, f) => ss.map((_, f)) }
        .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      val pairs = vocab.values.toSeq
        .flatMap { case (ss, f) => ss.zip(ss.drop(1)).map((_, f)) }
        .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      if (pairs.isEmpty) None
      else {
        val ((lhs, rhs), pc) = pairs.toSeq.map { case (p, pc) =>
          (p, pc, q(pc, sym(p._1), sym(p._2)))
        }.minBy { case ((l, rr), _, qs) => (-qs, l, rr) } match {
          case (p, pc, _) => (p, pc)
        }
        def apply(ss: List[String]): List[String] = ss match {
          case a :: b :: rest if a == lhs && b == rhs =>
            (a + b) :: apply(rest)
          case a :: rest => a :: apply(rest)
          case Nil => Nil
        }
        vocab = vocab.map { case (w, (ss, f)) => (w, (apply(ss), f)) }
        Some((r.toLong, lhs, rhs, lhs + rhs, pc,
          q(pc, sym(lhs), sym(rhs))))
      }
    }
    assert(run(tmp, 5) == expected)
  }

  test("q256 encode: per-source token counts follow the trained merges exactly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wp-enc").toString
    Seq((0L, "ab ab ab ab a a a a", "s1"), (1L, "a a a a xy xy", "s2"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    // after ONE merge (x,y)→xy: s1 words [ab×4 (2 syms), a×4 (1)] →
    //   12 tokens over 8 words / 12 chars; s2 [a×4 (1), xy×2 (1)] →
    //   6 tokens over 6 words / 8 chars
    val r1 = LangModel.q256WordPieceEncode(spark, tmp, rounds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(r1 == Seq(("s1", 8L, 12L, 12L, 1.0), ("s2", 6L, 8L, 6L, 8.0 / 6.0)))
  }
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q231 BPE vocabulary training: hand-computed merge sequences on
  * micro-corpora — greedy left-to-right application, weighted counts,
  * deterministic tie-break, and the exhausted-vocabulary round.
  */
class BpeTrainSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bpe").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def run(tmp: String, rounds: Int): Seq[(Long, String, String, String, Long)] =
    LangModel.q231BpeTrain(spark, tmp, rounds).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("hand-computed sequence: weighted counts, greedy overlap, and the exhausted third round") {
    // corpus: "abab" ×2, "ab" ×3.
    // round 1: pairs (a,b) = 2·2 + 3·1 = 7, (b,a) = 2 → merge (a,b)→ab (7)
    //   "a|b|a|b|" → "ab|ab|",  "a|b|" → "ab|"
    // round 2: (ab,ab) = 2 → merge → abab (2); vocab: "abab|", "ab|"
    // round 3: no adjacent pairs remain → NO row, both engines
    val tmp = writeDocs(Seq(
      (0L, "abab abab ab"), (1L, "ab ab")))
    assert(run(tmp, 3) == Seq(
      (1L, "a", "b", "ab", 7L),
      (2L, "ab", "ab", "abab", 2L)))
  }

  test("greedy left-to-right on an odd run: aaa merges to (aa)(a), counting non-overlapping pairs") {
    // "aaa": symbol string a|a|a| has pairs (a,a) at pos 0 and 1 — the
    // COUNT is positional (2), but the APPLY is non-overlapping greedy:
    // a|a|a| → aa|a|
    val tmp = writeDocs(Seq((0L, "aaa")))
    val got = run(tmp, 2)
    assert(got(0) == ((1L, "a", "a", "aa", 2L)))
    // round 2 merges the remainder (aa,a)
    assert(got(1) == ((2L, "aa", "a", "aaa", 1L)))
  }

  test("tie-break is (count DESC, lhs, rhs) — lexicographic smallest pair wins a tie") {
    // "ba" and "cb": pairs (b,a)=1 and (c,b)=1 — tie broken to (b,a)
    val tmp = writeDocs(Seq((0L, "ba cb")))
    assert(run(tmp, 1) == Seq((1L, "b", "a", "ba", 1L)))
  }

  test("merge application is boundary-anchored: a later merge whose lhs is the SUFFIX of an earlier merged symbol does not fire across the boundary") {
    // corpus: "ab"×10, "bc"×6, "abc"×3.
    // round 1: (a,b) = 13 beats (b,c) = 9 → merge ab; "abc" → [ab, c]
    // round 2: (b,c) = 6 (from "bc" only) beats (ab,c) = 3 → merge bc.
    //   An UNANCHORED replace of "b|c|" would also fire inside
    //   "ab|c|" (lhs b = suffix of symbol ab), corrupting "abc" to
    //   the single symbol [abc] though the pair (b,c) is absent —
    //   and round 3 would then find no pairs and emit NO row.
    // round 3 (anchored): (ab,c) = 3 from the intact [ab, c] → merge.
    val tmp = writeDocs(Seq(
      (0L, Seq.fill(10)("ab").mkString(" ")),
      (1L, Seq.fill(6)("bc").mkString(" ")),
      (2L, Seq.fill(3)("abc").mkString(" "))))
    assert(run(tmp, 3) == Seq(
      (1L, "a", "b", "ab", 13L),
      (2L, "b", "c", "bc", 6L),
      (3L, "ab", "c", "abc", 3L)))
  }

  test("non-[a-z] pre-tokens are excluded by the q79 letter-run convention") {
    val tmp = writeDocs(Seq((0L, "x9y x9y zz zz zz")))
    // "x9y" is filtered out; only "zz" trains
    assert(run(tmp, 1) == Seq((1L, "z", "z", "zz", 3L)))
  }

  test("q233 encode: per-source token counts follow the trained merges exactly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bpe-enc").toString
    Seq((0L, "abab abab ab", "s1"), (1L, "ab ab", "s2"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    // after ONE merge (a,b)→ab: "abab" encodes as [ab, ab], "ab" as [ab]
    val r1 = LangModel.q233BpeEncode(spark, tmp, rounds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(r1 == Seq(("s1", 3L, 10L, 5L, 2.0), ("s2", 2L, 4L, 2L, 2.0)))
    // after the second merge (ab,ab)→abab every word is one token
    val r2 = LangModel.q233BpeEncode(spark, tmp, rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(r2 == Seq(("s1", 3L), ("s2", 2L)))
  }
}

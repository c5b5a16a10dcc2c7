package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q272 byte-level BPE (the GPT-2 byte-encoder recipe): the q231 merge
  * loop over UTF-8 byte sequences, symbols as uppercase hex byte pairs.
  * Hand-computed merge sequences on micro-corpora with MULTI-BYTE
  * codepoints straddling merge boundaries from both sides — the case
  * the char-level lane cannot even represent (it filters to ^[a-z]+$).
  */
class ByteBpeSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bytebpe").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def run(tmp: String, rounds: Int): Seq[(Long, String, String, String, Long)] =
    LangModel.q272ByteBpeTrain(spark, tmp, rounds).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  // UTF-8 anchors used below:
  //   'a' = 61, 'b' = 62, 'é' = C3 A9, '🙂' = F0 9F 99 82

  test("a multi-byte codepoint's own bytes merge back together (é = C3+A9)") {
    // corpus: "éé" ×3 — bytes C3 A9 C3 A9. Pair counts per word instance:
    // (C3,A9) = 2 (positional), (A9,C3) = 1 → weighted ×3: 6 vs 3.
    val tmp = writeDocs(Seq((0L, "éé éé éé")))
    val got = run(tmp, 2)
    assert(got(0) == ((1L, "C3", "A9", "C3A9", 6L)))
    // round 2: the two é symbols merge — the codepoint pair
    assert(got(1) == ((2L, "C3A9", "C3A9", "C3A9C3A9", 3L)))
  }

  test("a merge straddles the codepoint boundary when the bytes earn it (ASCII + é)") {
    // corpus: "aé" ×5, "éb" ×2.
    // round 1 pairs: (61,C3)=5, (C3,A9)=5+2=7, (A9,62)=2 → merge (C3,A9).
    // round 2: (61,C3A9)=5 beats (C3A9,62)=2 → the merged symbol CROSSES
    // the ASCII/é codepoint boundary: one token spans 1-byte + 2-byte
    // codepoints — exactly what byte-level BPE exists to allow.
    val tmp = writeDocs(Seq((0L, Seq.fill(5)("aé").mkString(" ")),
      (1L, Seq.fill(2)("éb").mkString(" "))))
    assert(run(tmp, 2) == Seq(
      (1L, "C3", "A9", "C3A9", 7L),
      (2L, "61", "C3A9", "61C3A9", 5L)))
  }

  test("a 4-byte emoji trains with zero UNK; its bytes merge pairwise inside-out") {
    // corpus: "🙂" ×4 — bytes F0 9F 99 82: pairs (F0,9F), (9F,99), (99,82)
    // each ×4 — tie broken lexicographically: (99,82) < (9F,99) < (F0,9F).
    // round 2: after 99+82 → 9982, pairs (F0,9F) and (9F,9982) both 4 —
    // tie-break picks (9F,9982). round 3: (F0,9F9982) → the whole emoji.
    val tmp = writeDocs(Seq((0L, "🙂 🙂 🙂 🙂")))
    assert(run(tmp, 3) == Seq(
      (1L, "99", "82", "9982", 4L),
      (2L, "9F", "9982", "9F9982", 4L),
      (3L, "F0", "9F9982", "F09F9982", 4L)))
  }

  test("no word filter: mixed-script and digit-bearing words all train (no UNK lane)") {
    // "x9" (78 39) ×3 would be DROPPED by the char lane's ^[a-z]+$
    // filter; the byte lane must train on it
    val tmp = writeDocs(Seq((0L, "x9 x9 x9")))
    assert(run(tmp, 1) == Seq((1L, "78", "39", "7839", 3L)))
  }

  test("greedy non-overlap on repeated bytes matches the char lane's law") {
    // "aaa" = 61 61 61: count 2 (positional), apply leaves [6161, 61]
    val tmp = writeDocs(Seq((0L, "aaa")))
    val got = run(tmp, 2)
    assert(got(0) == ((1L, "61", "61", "6161", 2L)))
    assert(got(1) == ((2L, "6161", "61", "616161", 1L)))
  }

  test("the trained vocabulary represents every word exactly (round-trip, zero UNK)") {
    import org.apache.spark.sql.functions._
    val tmp = writeDocs(Seq((0L, "héllo héllo wörld 🙂x")))
    val (_, vocab) = LangModel.byteBpeTrainFrames(spark, tmp, rounds = 4)
    // concatenating each word's final symbols re-hexes the word exactly —
    // merges repartition the byte string, they never lose or invent bytes
    val bad = vocab.select(col("word"), col("s"))
      .withColumn("rejoined", regexp_replace(col("s"), "[|]+", ""))
      .withColumn("expected", hex(encode(col("word"), "UTF-8")))
      .filter(col("rejoined") =!= col("expected"))
      .count()
    assert(bad == 0)
  }
}

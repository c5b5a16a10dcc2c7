package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q286 CCNet-style duplicate-segment removal: keeper determinism,
  * order-preserving reconstruction, and the fully-duplicated-document
  * edge, on a constructed corpus with W-word segments (W = 4 here so
  * the fixtures stay readable).
  */
class SegmentDedupSpec extends SparkSpec {

  private def run(texts: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-segdedup").toString
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    Dedup.q286SegmentDedup(spark, tmp, w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
  }

  test("a duplicated segment survives exactly once, at its globally first position") {
    // "a b c d" opens doc 0 and recurs mid-doc-1 and opens doc 2
    val texts = Seq(
      0L -> "a b c d e f g h",
      1L -> "x y z w a b c d",
      2L -> "a b c d q r s t")
    val got = run(texts, 4)
    assert(got(0L) == (2L, 2L, "a b c d e f g h")) // first instance: keeps all
    assert(got(1L) == (2L, 1L, "x y z w"))          // its copy dropped
    assert(got(2L) == (2L, 1L, "q r s t"))          // its copy dropped
  }

  test("reconstruction preserves segment order and a short tail segment") {
    // 10 words at w=4: segments of 4, 4, 2 — tail survives intact
    val texts = Seq(
      0L -> "p q r s t u v w y z",
      1L -> "t u v w k l m n")  // duplicates doc 0's SECOND segment
    val got = run(texts, 4)
    assert(got(0L) == (3L, 3L, "p q r s t u v w y z"))
    assert(got(1L) == (2L, 1L, "k l m n"))
  }

  test("a fully-duplicated later document reconstructs to the empty string") {
    val texts = Seq(
      0L -> "a b c d e f g h",
      1L -> "a b c d e f g h")
    val got = run(texts, 4)
    assert(got(0L) == (2L, 2L, "a b c d e f g h"))
    assert(got(1L) == (2L, 0L, ""))
  }

  test("within-document repeats also collapse to the first occurrence") {
    val texts = Seq(0L -> "a b c d a b c d e f g h")
    val got = run(texts, 4)
    assert(got(0L) == (3L, 2L, "a b c d e f g h"))
  }
}

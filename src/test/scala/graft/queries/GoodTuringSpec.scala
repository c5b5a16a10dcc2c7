package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q265 Good–Turing unseen mass: hand-computed micro-corpus plus the
  * probability-mass laws on the test corpus.
  */
class GoodTuringSpec extends SparkSpec {

  test("hand-computed frequency-of-frequencies on a micro corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-gt").toString
    // s1: a a b c  -> N=4, vocab=3, n1=2 (b,c), n2=1 (a), p0=0.5, r*=1.0
    // s2: x x y y  -> N=4, vocab=2, n1=0, n2=2, p0=0.0, r* NULL (no hapax)
    Seq((0L, "a a b c", "s1"), (1L, "x x y y", "s2"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = TextOps.q265GoodTuring(spark, tmp).collect()
    val m = got.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getFloat(5), if (r.isNullAt(6)) None else Some(r.getFloat(6))))).toMap
    assert(m("s1") == ((4L, 3L, 2L, 1L, 0.5f, Some(1.0f))))
    assert(m("s2") == ((4L, 2L, 0L, 2L, 0.0f, None)))
  }

  test("p_unseen is a probability and hapaxes never exceed the vocabulary") {
    val rows = TextOps.q265GoodTuring(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getFloat(5) >= 0f && r.getFloat(5) <= 1f)
      assert(r.getLong(3) + r.getLong(4) <= r.getLong(2))
      assert(r.getLong(2) <= r.getLong(1))
    }
  }
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q267 Church–Gale burstiness: hand-computed cf/df on a micro corpus
  * plus the cf >= df >= 1 law on the test corpus.
  */
class BurstinessSpec extends SparkSpec {

  test("hand-computed cf/df on a micro corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-burst").toString
    // a: cf 4 over 2 docs (3+1) -> 2.0; b: cf 2 in 1 doc -> 2.0;
    // c: cf 1 in 1 doc -> 1.0
    Seq((0L, "a a a b b"), (1L, "a c"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = TextOps.q267Burstiness(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", 4L, 2L, 2.0), ("b", 2L, 1L, 2.0), ("c", 1L, 1L, 1.0)))
  }

  test("cf >= df >= 1 and burstiness >= 1 on the test corpus") {
    val rows = TextOps.q267Burstiness(spark, "/root/testdata/sf0.001").collect()
    // the synthetic corpus has a small closed vocabulary — the report
    // returns min(vocab, 50) rows
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 1L)
      assert(r.getDouble(3) >= 1.0)
    }
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q230 variable-length substring dedup (ExactSubstr, Lee et al.):
  * the straddle case q81's aligned spans provably miss, removal-mask
  * conservation laws on the real corpus, and the within-document
  * duplication edge.
  */
class SubstrDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val L = Dedup.SubstrL

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-substr").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("straddle case: a passage duplicated at different offsets — q81 finds nothing, q230 removes it from both docs") {
    import spark.implicits._
    // 20-word passage P at word offset 5 in doc 0 and offset 0 in doc 1:
    // q81's 16-word spans are aligned per doc, so no two span STRINGS
    // match (offsets differ by 5), while every stride-1 L-gram of P is
    // shared — the exact criterion q230 implements.
    val p = (1 to 20).map(i => s"p$i").mkString(" ")
    val head0 = (1 to 5).map(i => s"h$i").mkString(" ")
    val tail1 = (1 to 7).map(i => s"t$i").mkString(" ")
    val tmp = writeDocs(Seq((0L, s"$head0 $p"), (1L, s"$p $tail1")))

    val q81 = Dedup.q81SpanDedup(spark, tmp)
      .agg(sum($"n_dropped")).collect()(0).getLong(0)
    assert(q81 == 0L, "q81 must miss the straddled passage for this test to bite")

    val byId = Dedup.q230SubstrDedup(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    // all 20 passage tokens removed from BOTH docs (all-occurrences
    // semantics), context words survive
    assert(byId(0L) == ((1L, 20L, head0)))
    assert(byId(1L) == ((1L, 20L, tail1)))
  }

  test("a document sharing no L-gram with the corpus round-trips unchanged") {
    import spark.implicits._
    val out = Dedup.q230SubstrDedup(spark, dir)
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val joined = out.filter($"n_removed" === 0).join(orig, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter($"text_clean" =!= $"text").count() == 0)
  }

  test("removal-mask conservation on the real corpus: kept tokens + removed tokens = all tokens") {
    import spark.implicits._
    val out = Dedup.q230SubstrDedup(spark, dir)
      .select($"n_tokens", $"n_removed",
        when($"text_clean" === "", 0)
          .otherwise(size(split($"text_clean", " "))).cast("long").as("kept"))
    assert(out.filter($"kept" + $"n_removed" =!= $"n_tokens").count() == 0)
    // and the corpus actually exercises the operator
    assert(out.agg(sum($"n_removed")).collect()(0).getLong(0) > 0)
  }

  test("within-document duplication: a passage repeated twice in ONE doc is removed at both occurrences") {
    import spark.implicits._
    val p = (1 to L).map(i => s"q$i").mkString(" ")
    val mid = (1 to L + 1).map(i => s"m$i").mkString(" ") // > L so the gap survives
    val tmp = writeDocs(Seq((0L, s"$p $mid $p")))
    val r = Dedup.q230SubstrDedup(spark, tmp).collect()(0)
    assert(r.getLong(2) == 2L) // two disjoint removal regions
    assert(r.getLong(3) == 2L * L)
    assert(r.getString(4) == mid)
  }

  test("a duplicated run shorter than L is kept") {
    import spark.implicits._
    val short = (1 to L - 1).map(i => s"s$i").mkString(" ")
    val f0 = (1 to 3).map(i => s"a$i").mkString(" ")
    val f1 = (1 to 3).map(i => s"b$i").mkString(" ")
    val tmp = writeDocs(Seq((0L, s"$short $f0"), (1L, s"$short $f1")))
    val got = Dedup.q230SubstrDedup(spark, tmp)
      .agg(sum($"n_removed")).collect()(0).getLong(0)
    assert(got == 0L)
  }

  test("q246: a test doc quoting ONE train paragraph is flagged (the low-Jaccard " +
    "case document-level near-dup misses); clean eval docs are not") {
    import spark.implicits._
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val trainId = (1L to 500L).find(bucket(_) < 80).get
    val testId = (1L to 500L).find(bucket(_) >= 90).get
    val cleanId = (1L to 500L).filter(bucket(_) >= 90).apply(1)
    val passage = (1 to L).map(i => s"p$i").mkString(" ")
    // train doc: 100 filler words + the passage → test doc quotes ONLY
    // the passage inside its own 100 different words: Jaccard ≈ 0.07
    val trainText = (1 to 100).map(i => s"t$i").mkString(" ") + " " + passage
    val testText = (1 to 50).map(i => s"e$i").mkString(" ") + " " + passage +
      " " + (51 to 100).map(i => s"e$i").mkString(" ")
    val cleanText = (1 to 60).map(i => s"c$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (trainId, trainText), (testId, testText), (cleanId, cleanText)))
    val rows = Dedup.q246SplitContamination(spark, tmp).collect()
    assert(rows.length == 1, s"exactly the quoting test doc: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("doc_id") == testId)
    assert(r.getAs[String]("split") == "test")
    // a verbatim L-word quote yields exactly one shared L-gram and
    // covers exactly L tokens
    assert(r.getAs[Long]("n_contam_grams") == 1L)
    assert(r.getAs[Long]("n_tokens_covered") == L.toLong)
  }

  test("q246: real-corpus flags are all eval-side with sane coverage") {
    val rows = Dedup.q246SplitContamination(spark, dir).collect()
    rows.foreach { r =>
      assert(Set("val", "test")(r.getAs[String]("split")))
      assert(r.getAs[Long]("n_contam_grams") >= 1L)
      assert(r.getAs[Long]("n_tokens_covered") >= L.toLong)
    }
  }
}

package graft.queries

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** q126 prefix filtering is LOSSLESS by the prefix-filtering lemma —
  * pin that against the q40 quadratic baseline on an adversarial
  * random corpus: tiny vocabulary (hot shingles everywhere), heavy
  * near-duplication, varied lengths. Any false negative from the
  * prefix-length arithmetic (the float-ceil corner) or the df ordering
  * shows up as a missing pair here.
  */
class PrefixJoinSpec extends SparkSpec {

  test("q126 == q40 on a hot-vocabulary random corpus") {
    import spark.implicits._
    val rnd = new Random(126)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(): String =
      Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Vector.fill(40)(doc())
    // near-dups: append one word to a base doc (high-Jaccard pairs)
    val rows = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      base.take(20).zipWithIndex.map { case (t, i) =>
        ((100 + i).toLong, t + " " + vocab(rnd.nextInt(vocab.size))) }
    val tmp = Files.createTempDirectory("graft-ppj").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.q40NgramJaccard(spark, tmp))
    val prefix = pairs(Dedup.q126PrefixJoin(spark, tmp))
    assert(exact.nonEmpty, "fixture must actually produce near-dup pairs")
    assert(prefix == exact,
      s"missing=${exact -- prefix} spurious=${prefix -- exact}")
  }

  test("q135 containment is asymmetric: the pasted paragraph flags, its host does not") {
    import spark.implicits._
    // doc 0 is a fragment fully pasted inside doc 1 (plus unrelated
    // padding), so every shingle of 0 appears in 1: containment(0->1)=1.
    // The reverse direction dilutes far below τ. Jaccard is low, so the
    // q40 lane would MISS this pair — the point of the operator.
    val frag = "one two three four five six seven eight"
    val host = frag + " pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9 pad10 " +
      "pad11 pad12 pad13 pad14 pad15 pad16 pad17 pad18 pad19 pad20"
    val tmp = Files.createTempDirectory("graft-cont").toString
    Seq((0L, frag), (1L, host), (2L, "unrelated words entirely different tokens"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q135Containment(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == List((0L, 1L, 1.0)),
      s"expected exactly the (0 contained-in 1) pair, got $got")
    val jacc = Dedup.q40NgramJaccard(spark, tmp).collect()
    assert(jacc.isEmpty, "fixture must be invisible to the Jaccard lane")
  }

  test("q138: the leakage matrix folds unordered source pairs correctly") {
    import spark.implicits._
    // three byte-identical docs: 0,2 in src0 and 1 in src1 -> pairs
    // (0,1) (0,2) (1,2); matrix: within-src0 = 1, src0-src1 = 2 (the
    // (1,2) pair arrives as src1-src0 and must fold onto src0-src1)
    val t = "one two three four five six seven eight nine ten"
    val tmp = Files.createTempDirectory("graft-leak").toString
    Seq((0L, t, "src0"), (1L, t, "src1"), (2L, t, "src0"),
        (3L, "entirely different words here nothing shared", "src1"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q138SourceOverlap(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(got == List(("src0", "src0", 1L), ("src0", "src1", 2L)))
  }

  test("q135 == brute force on the hot-vocabulary corpus") {
    import spark.implicits._
    val rnd = new Random(135)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc(): String =
      Seq.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Vector.fill(30)(doc())
    val rows = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      base.take(15).zipWithIndex.map { case (t, i) =>
        ((100 + i).toLong, t + " " + doc()) } // containment-heavy pairs
    val tmp = Files.createTempDirectory("graft-cbrute").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // brute force: verify EVERY ordered pair via the same shingle sets
    val sh = rows.map { case (id, t) =>
      id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet }.toMap
    val expected = (for {
      (a, sa) <- sh; (b, sb) <- sh if a != b
      c = sa.intersect(sb).size.toDouble / sa.size if c >= 0.9
    } yield (a, b)).toSet
    val got = Dedup.q135Containment(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce containment pairs")
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }
}

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
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q287 Stupid Backoff: each backoff tier fires on a constructed
  * corpus where every tier is reachable, checked against a hand model
  * (score = relative frequency at the deepest seen order, ×0.4 per
  * backoff step, OOV floor 0.4²·(1/N)).
  */
class StupidBackoffSpec extends SparkSpec {

  test("all four tiers score exactly as the hand model on a constructed corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sb").toString
    // doc_id 10 is the EVAL fold (% 10 == 0); 1..3 train.
    // eval trigrams: (a,b,c) seen; (b,c,x) unseen trigram + seen bigram
    // (c,x); (c,x,q) unseen both + seen unigram q; (x,q,zz) unseen w3.
    val texts = Seq(
      1L  -> "a b c d a b e",
      2L  -> "z c x",
      3L  -> "q m n",
      10L -> "a b c x q zz")
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")

    val train = texts.filter(_._1 % 10 != 0).map(_._2)
    def grams(n: Int) = train.flatMap(_.split(" ").sliding(n).map(_.mkString(" ")))
      .groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
    val (c3, c2, c1) = (grams(3), grams(2), grams(1))
    val nTok = train.map(_.split(" ").length).sum.toDouble
    def sb(t: String): Double = {
      val w = t.split(" ")
      val (b12, b23) = (s"${w(0)} ${w(1)}", s"${w(1)} ${w(2)}")
      if (c3.contains(t)) c3(t).toDouble / c2(b12)
      else if (c2.contains(b23)) 0.4 * (c2(b23).toDouble / c1(w(1)))
      else 0.4 * 0.4 * (c1.getOrElse(w(2), 1L).toDouble / nTok)
    }
    // pin that the fixture really reaches all four tiers
    assert(c3.contains("a b c"))
    assert(!c3.contains("b c x") && c2.contains("c x"))
    assert(!c2.contains("x q") && c1.contains("q"))
    assert(!c1.contains("zz"))

    val evalTris = "a b c x q zz".split(" ").sliding(3).map(_.mkString(" ")).toSeq
    val want = evalTris.map(t => math.log(sb(t)))
    val got = LangModel.q287StupidBackoff(spark, tmp).collect()
    assert(got.length == 1 && got.head.getLong(0) == 10L)
    assert(got.head.getLong(1) == evalTris.length)
    val gotAvg = got.head.getFloat(got.head.fieldIndex("avg_score_sb"))
    assert(math.abs(gotAvg - want.sum / want.length) < 1e-6,
      s"$gotAvg vs ${want.sum / want.length}")
  }
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q282 Kneser–Ney: the smoothing's defining invariants, computed from
  * the model's own count tables on a tiny constructed corpus.
  */
class KneserNeySpec extends SparkSpec {

  private val D = 0.75

  /** Model tables (c2, ch, n1f, n1b, nbb) from a corpus, built the
    * same way the query builds them but collected for hand arithmetic.
    */
  private def model(texts: Seq[String]): (Map[(String, String), Long],
      Map[String, (Long, Long)], Map[String, Long], Long) = {
    val bigrams = texts.flatMap { t =>
      val w = t.split(" "); w.dropRight(1).zip(w.drop(1))
    }
    val c2 = bigrams.groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    val hist = c2.groupBy(_._1._1).map { case (w1, m) =>
      (w1, (m.values.sum, m.size.toLong))
    }
    val cont = c2.groupBy(_._1._2).map { case (w2, m) => (w2, m.size.toLong) }
    (c2, hist, cont, c2.size.toLong)
  }

  private def pKn(c2: Map[(String, String), Long],
      hist: Map[String, (Long, Long)], cont: Map[String, Long], nbb: Long)(
      w1: String, w2: String): Double = {
    val (ch, n1f) = hist(w1)
    (math.max(c2.getOrElse((w1, w2), 0L) - D, 0.0) +
      D * n1f * (cont.getOrElse(w2, 0L).toDouble / nbb)) / ch
  }

  test("KN probabilities sum to 1 over the vocabulary for every history " +
    "(discounted mass exactly funds the continuation backoff)") {
    val texts = Seq("a b a c a b", "b c a a c", "c a b b a")
    val (c2, hist, cont, nbb) = model(texts)
    val vocab = texts.flatMap(_.split(" ")).distinct
    for (w1 <- hist.keys) {
      val total = vocab.map(w2 => pKn(c2, hist, cont, nbb)(w1, w2)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum over vocab for '$w1' = $total")
    }
  }

  test("the Francisco effect: a frequent word that follows only one context " +
    "scores LOWER after an unseen history than a rarer but promiscuous word") {
    // "francisco" appears 3 times, always after "san"; "the" appears
    // twice after two different contexts. After history "b" (which
    // precedes neither), continuation probability must rank "the"
    // above "francisco" despite the raw-frequency order.
    val texts = Seq("san francisco a san francisco b san francisco",
      "a the b the a b")
    val (c2, hist, cont, nbb) = model(texts)
    val p = pKn(c2, hist, cont, nbb) _
    assert(p("b", "the") > p("b", "francisco"))
    assert(c2.keys.count(_._2 == "francisco") == 1) // by construction
  }

  test("q282 matches the hand model on the constructed corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kn").toString
    val texts = Seq((0L, "a b a c a b"), (1L, "b c a a c"), (2L, "c a b b a"))
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val (c2, hist, cont, nbb) = model(texts.map(_._2))
    val p = pKn(c2, hist, cont, nbb) _
    val got = LangModel.q282KneserNey(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getFloat(r.fieldIndex("avg_logprob_kn")))).toMap
    for ((id, text) <- texts) {
      val w = text.split(" ")
      val lps = w.dropRight(1).zip(w.drop(1)).map { case (a, b) => math.log(p(a, b)) }
      val want = lps.sum / lps.length
      assert(math.abs(got(id) - want) < 1e-6, s"doc $id: ${got(id)} vs $want")
    }
  }
}

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

  // --- order 3 (q285): recursive interpolated backoff -------------

  /** Trigram model tables built the way the query builds them: raw
    * counts at the top, continuation counts below, backoff weights
    * from the table each level is estimated from.
    */
  private def model3(texts: Seq[String]): (
      Map[(String, String, String), Long],  // c3
      Map[(String, String), (Long, Long)],  // (w1,w2) -> (ch3, n3f)
      Map[(String, String), Long],          // (w2,w3) -> n1b3
      Map[String, (Long, Long)],            // w2 -> (nmid, n2f3)
      Map[String, Long], Long) = {          // cont n1b, nbb
    val tris = texts.flatMap { t =>
      val w = t.split(" ")
      (0 until w.length - 2).map(i => (w(i), w(i + 1), w(i + 2)))
    }
    val c3 = tris.groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
    val h3 = c3.groupBy(t => (t._1._1, t._1._2)).map { case (h, m) =>
      (h, (m.values.sum, m.size.toLong))
    }
    val c3t = c3.groupBy(t => (t._1._2, t._1._3)).map { case (k, m) => (k, m.size.toLong) }
    val mid = c3t.groupBy(_._1._1).map { case (w2, m) =>
      (w2, (m.values.sum, m.size.toLong))
    }
    val (_, _, cont, nbb) = model(texts)
    (c3, h3, c3t, mid, cont, nbb)
  }

  private def pKn3(texts: Seq[String])(w1: String, w2: String, w3: String): Double = {
    val (c3, h3, c3t, mid, cont, nbb) = model3(texts)
    val (ch3, n3f) = h3((w1, w2))
    val (nmid, n2f3) = mid(w2)
    val pc = cont.getOrElse(w3, 0L).toDouble / nbb
    val p2c = (math.max(c3t.getOrElse((w2, w3), 0L) - D, 0.0) + D * n2f3 * pc) / nmid
    (math.max(c3.getOrElse((w1, w2, w3), 0L) - D, 0.0) + D * n3f * p2c) / ch3
  }

  test("order-3 KN probabilities sum to 1 over the vocabulary for every history") {
    val texts = Seq("a b a c a b", "b c a a c", "c a b b a", "a c b a b c")
    val (_, h3, _, _, _, _) = model3(texts)
    val vocab = texts.flatMap(_.split(" ")).distinct
    for ((w1, w2) <- h3.keys) {
      val total = vocab.map(w3 => pKn3(texts)(w1, w2, w3)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum over vocab for '$w1 $w2' = $total")
    }
  }

  test("q285 matches the hand model on the constructed corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kn3").toString
    val texts = Seq((0L, "a b a c a b"), (1L, "b c a a c"), (2L, "c a b b a"))
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val p = pKn3(texts.map(_._2)) _
    val got = LangModel.q285KneserNeyTrigram(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getFloat(r.fieldIndex("avg_logprob_kn3")))).toMap
    for ((id, text) <- texts) {
      val w = text.split(" ")
      val lps = (0 until w.length - 2).map(i => math.log(p(w(i), w(i + 1), w(i + 2))))
      val want = lps.sum / lps.length
      assert(math.abs(got(id) - want) < 1e-6, s"doc $id: ${got(id)} vs $want")
    }
  }

  test("backoff weight uses the continuation table's types, not raw bigram types") {
    // "x y" occurs ONLY document-initially: a bigram type with NO
    // trigram. If the middle-level weight counted raw bigram types,
    // history-("q","x") mass would leak and the vocab sum would miss 1.
    val texts = Seq("x y a x b", "q x c q x c")
    val vocab = texts.flatMap(_.split(" ")).distinct
    val (_, h3, _, _, _, _) = model3(texts)
    for ((w1, w2) <- h3.keys) {
      val total = vocab.map(w3 => pKn3(texts)(w1, w2, w3)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum over vocab for '$w1 $w2' = $total")
    }
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

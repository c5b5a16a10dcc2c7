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

  // --- order 4 + min-count pruning (q290) --------------------------

  /** Order-4 model tables incl. the pruning inventory: per history the
    * full normalizer ch4, kept-type count nk4 and kept mass ck4 at the
    * given min-count — built the way the query builds them.
    */
  private def model4(texts: Seq[String]): (
      Map[(String, String, String, String), Long],          // c4
      Map[(String, String, String), (Long, Long)],          // h -> (ch4, ·)
      Map[(String, String, String), Long],                  // (w2,w3,w4) -> n1b4
      Map[(String, String), (Long, Long)],                  // (w2,w3) -> (nmid3, n3f4)
      Map[(String, String), Long],                          // (w3,w4) -> n1b3
      Map[String, (Long, Long)]) = {                        // w3 -> (nmid2, n2f3)
    val quads = texts.flatMap { t =>
      val w = t.split(" ")
      (0 until w.length - 3).map(i => (w(i), w(i + 1), w(i + 2), w(i + 3)))
    }
    val c4 = quads.groupBy(identity).map { case (q, o) => (q, o.size.toLong) }
    val h4 = c4.groupBy(q => (q._1._1, q._1._2, q._1._3)).map { case (h, m) =>
      (h, (m.values.sum, m.size.toLong))
    }
    val c4t = c4.groupBy(q => (q._1._2, q._1._3, q._1._4))
      .map { case (k, m) => (k, m.size.toLong) }
    val mid3 = c4t.groupBy(k => (k._1._1, k._1._2)).map { case (k, m) =>
      (k, (m.values.sum, m.size.toLong))
    }
    val tris = texts.flatMap { t =>
      val w = t.split(" ")
      (0 until w.length - 2).map(i => (w(i), w(i + 1), w(i + 2)))
    }.distinct
    val tg3 = tris.groupBy(t => (t._2, t._3)).map { case (k, o) => (k, o.size.toLong) }
    val mid2 = tg3.groupBy(_._1._1).map { case (w3, m) =>
      (w3, (m.values.sum, m.size.toLong))
    }
    (c4, h4, c4t, mid3, tg3, mid2)
  }

  private def pKn4(texts: Seq[String], mc: Int)(
      w1: String, w2: String, w3: String, w4: String): Double = {
    val (c4, h4, c4t, mid3, tg3, mid2) = model4(texts)
    val (_, _, cont, nbb) = model(texts)
    val (ch4, _) = h4((w1, w2, w3))
    val kept = c4.filter { case (q, c) =>
      (q._1, q._2, q._3) == ((w1, w2, w3)) && c >= mc
    }
    val nk4 = kept.size.toLong
    val ck4 = kept.values.sum
    val (nmid3, n3f4) = mid3((w2, w3))
    val (nmid2, n2f3) = mid2(w3)
    val pc = cont.getOrElse(w4, 0L).toDouble / nbb
    val p2c = (math.max(tg3.getOrElse((w3, w4), 0L) - D, 0.0) + D * n2f3 * pc) / nmid2
    val p3c = (math.max(c4t.getOrElse((w2, w3, w4), 0L) - D, 0.0) + D * n3f4 * p2c) / nmid3
    val c = c4.getOrElse((w1, w2, w3, w4), 0L)
    val top = if (c >= mc) c - D else 0.0
    val m = D * nk4 + (ch4 - ck4)
    (top + m * p3c) / ch4
  }

  // corpus with a REPEATED 4-gram ("a b c d" twice) so min-count 2
  // keeps at least one type while singletons prune
  private val texts4 = Seq("a b c d a b c d e", "b c d e a b c a", "c a b c d b a e")

  test("order-4 KN probabilities sum to 1 for every history, UNPRUNED (min-count 1)") {
    val vocab = texts4.flatMap(_.split(" ")).distinct
    val (_, h4, _, _, _, _) = model4(texts4)
    for (h <- h4.keys) {
      val total = vocab.map(w4 => pKn4(texts4, 1)(h._1, h._2, h._3, w4)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum over vocab for '$h' = $total")
    }
  }

  test("order-4 KN probabilities sum to 1 under the min-count-2 prune " +
    "(a pruned type's WHOLE count funds the backoff, not just its discount)") {
    val vocab = texts4.flatMap(_.split(" ")).distinct
    val (c4, h4, _, _, _, _) = model4(texts4)
    // the prune must be LIVE in this corpus: some type kept, some pruned
    assert(c4.values.exists(_ >= 2) && c4.values.exists(_ < 2))
    for (h <- h4.keys) {
      val total = vocab.map(w4 => pKn4(texts4, 2)(h._1, h._2, h._3, w4)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum over vocab for '$h' = $total")
    }
    // and the NAIVE prune (drop the type but fund backoff with only the
    // kept discounts D·N_kept, losing the pruned counts) must MISS 1 —
    // the mass-redistribution subtlety the lane exists to get right
    val prunedHists = c4.collect {
      case (q, c) if c < 2 => (q._1, q._2, q._3)
    }.toSet
    for (h <- prunedHists) {
      val kept = c4.filter { case (q, c) => (q._1, q._2, q._3) == h && c >= 2 }
      val prunedMass = (h4(h)._1 - kept.values.sum).toDouble
      assert(prunedMass > 0, s"history $h should carry pruned mass")
      // naive total = correct total − prunedMass·ΣP3c/ch4 = 1 − prunedMass/ch4
      val naiveTotal = 1.0 - prunedMass / h4(h)._1
      assert(naiveTotal < 1.0 - 1e-9, s"naive prune at $h should leak mass")
    }
  }

  test("q290 matches the hand model (probabilities AND per-doc pruned-hit counts)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kn4").toString
    val docs = texts4.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val (c4, _, _, _, _, _) = model4(texts4)
    val p = pKn4(texts4, 2) _
    val got = LangModel.q290KneserNey4Pruned(spark, tmp).collect()
      .map(r => r.getLong(0) -> (
        r.getLong(r.fieldIndex("n_pruned")),
        r.getFloat(r.fieldIndex("avg_logprob_kn4")))).toMap
    for ((id, text) <- docs) {
      val w = text.split(" ")
      val qs = (0 until w.length - 3).map(i => (w(i), w(i + 1), w(i + 2), w(i + 3)))
      val lps = qs.map(q => math.log(p(q._1, q._2, q._3, q._4)))
      val want = lps.sum / lps.length
      val wantPruned = qs.count(q => c4(q) < 2).toLong
      assert(got(id)._1 == wantPruned, s"doc $id pruned: ${got(id)._1} vs $wantPruned")
      assert(math.abs(got(id)._2 - want) < 1e-6, s"doc $id: ${got(id)._2} vs $want")
    }
  }

  test("q291 model export: stored probs equal the interpolated model on kept types; " +
    "backoff·P3c reproduces it on pruned ones (serving equivalence)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kn4x").toString
    texts4.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val (c4, _, c4t, mid3, tg3, mid2) = model4(texts4)
    val (_, _, cont, nbb) = model(texts4)
    def p3c(w2: String, w3: String, w4: String): Double = {
      val (nmid3, n3f4) = mid3((w2, w3))
      val (nmid2, n2f3) = mid2(w3)
      val pcv = cont.getOrElse(w4, 0L).toDouble / nbb
      val p2c = (math.max(tg3.getOrElse((w3, w4), 0L) - D, 0.0) + D * n2f3 * pcv) / nmid2
      (math.max(c4t.getOrElse((w2, w3, w4), 0L) - D, 0.0) + D * n3f4 * p2c) / nmid3
    }
    val rows = LangModel.q291Kn4ModelExport(spark, tmp).collect()
    val stored = rows.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3)) -> (r.getAs[Float]("prob"), r.getAs[Float]("backoff"))).toMap
    // exactly the kept types are stored
    assert(stored.keySet == c4.filter(_._2 >= 2).keySet.map(q => (q._1, q._2, q._3, q._4)))
    for ((q, (prob, _)) <- stored)
      assert(math.abs(prob - pKn4(texts4, 2)(q._1, q._2, q._3, q._4)) < 1e-6, s"$q")
    // serving a PRUNED 4-gram: backoff(h)·P3c — the exported γ when the
    // history has kept siblings, γ = 1 (the ARPA absent-history
    // convention, which M(h)=c(h·) makes EXACT here) when it has none
    val gammaOf = stored.toSeq.groupBy { case (q, _) => (q._1, q._2, q._3) }
      .map { case (h, g) => h -> g.head._2._2.toDouble }
    for ((q, c) <- c4 if c < 2) {
      val gamma = gammaOf.getOrElse((q._1, q._2, q._3), 1.0)
      val served = gamma * p3c(q._2, q._3, q._4)
      val want = pKn4(texts4, 2)(q._1, q._2, q._3, q._4)
      assert(math.abs(served - want) < 1e-6, s"$q: $served vs $want")
    }
    // both gamma sources exercised: some pruned type's history has kept
    // siblings, some has none
    val prunedHists = c4.collect { case (q, c) if c < 2 => (q._1, q._2, q._3) }.toSet
    assert(prunedHists.exists(gammaOf.contains) && !prunedHists.forall(gammaOf.contains))
  }

  test("q295 serving a persisted model reproduces q290's in-plan scores " +
    "EXACTLY on the eval fold (stored-else-backoff loses nothing)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kn4s").toString
    // 20 docs recycling the corpus so the doc_id % 10 = 0 fold has two
    // members and the model sees repeated 4-gram types across docs; a
    // unique letter-only tail per doc makes its last 4-grams singletons
    // so the fold genuinely takes the backoff path too
    val docs = (0 until 20).map(i =>
      (i.toLong, texts4(i % texts4.length) + " q" + ('a' + i).toChar))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val want = LangModel.q290KneserNey4Pruned(spark, tmp)
      .filter($"doc_id" % 10 === 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getFloat(3), r.getFloat(4))).toMap
    val got = LangModel.q295Kn4ModelServe(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(r.fieldIndex("n_4grams")),
        r.getLong(r.fieldIndex("n_stored")),
        r.getLong(r.fieldIndex("n_backoff")),
        r.getFloat(r.fieldIndex("sum_logprob_kn4")),
        r.getFloat(r.fieldIndex("avg_logprob_kn4")))).toMap
    assert(got.keySet == want.keySet && got.keySet == Set(0L, 10L))
    for ((id, (n4, np, sum, avg)) <- want) {
      val (gn4, gStored, gBack, gSum, gAvg) = got(id)
      assert(gn4 == n4 && gBack == np && gStored == n4 - np, s"doc $id counts")
      // float EQUALITY, not tolerance: the serving double chain is the
      // same shape as q290's, so the presented floats must be identical
      assert(gSum == sum && gAvg == avg, s"doc $id: $gSum/$gAvg vs $sum/$avg")
    }
    // the fold genuinely exercises the backoff tier
    assert(want.values.exists(_._2 > 0))
  }

  // --- held-out closed-vocab KN (q293) -----------------------------

  /** Closed-vocab model: singleton train tokens → <unk>, bigram tables
    * from the MAPPED stream, continuation level terminated at uniform
    * over the closed vocabulary.
    */
  private def modelHo(train: Seq[String]): (
      Set[String],                        // kept vocab (excl. unk)
      Map[(String, String), Long],        // mapped c2
      Map[String, (Long, Long)],          // w1 -> (ch, n1f)
      Map[String, Long],                  // w2 -> n1b
      Long, Long, Long) = {               // nbb, tt, V
    val toks = train.flatMap(_.split(" "))
    val kept = toks.groupBy(identity).collect {
      case (w, o) if o.size >= 2 => w
    }.toSet
    def m(w: String) = if (kept(w)) w else "<unk>"
    val bigrams = train.flatMap { t =>
      val w = t.split(" "); w.dropRight(1).zip(w.drop(1)).map { case (a, b) => (m(a), m(b)) }
    }
    val c2 = bigrams.groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    val hist = c2.groupBy(_._1._1).map { case (w1, g) => (w1, (g.values.sum, g.size.toLong)) }
    val cont = c2.groupBy(_._1._2).map { case (w2, g) => (w2, g.size.toLong) }
    (kept, c2, hist, cont, c2.size.toLong, cont.size.toLong, kept.size.toLong + 1)
  }

  private def pHo(train: Seq[String])(w1: String, w2: String): Double = {
    val (kept, c2, hist, cont, nbb, tt, v) = modelHo(train)
    def m(w: String) = if (kept(w)) w else "<unk>"
    val (a, b) = (m(w1), m(w2))
    val pc = (math.max(cont.getOrElse(b, 0L) - D, 0.0) + D * tt * (1.0 / v)) / nbb
    hist.get(a) match {
      case Some((ch, n1f)) =>
        (math.max(c2.getOrElse((a, b), 0L) - D, 0.0) + D * n1f * pc) / ch
      case None => pc
    }
  }

  private val trainHo = Seq("a b a c a b d", "b c a a c e", "c a b b a")
  // singletons d, e → <unk>; vocab = {a, b, c} ∪ {<unk>}

  test("held-out closed-vocab KN sums to 1 over the vocabulary INCLUDING <unk>, " +
    "for model histories and for the absent-history fallback") {
    val (kept, _, hist, _, _, _, _) = modelHo(trainHo)
    val vocab = kept.toSeq :+ "zzz" // zzz maps to <unk>
    for (h <- hist.keys) {
      val total = vocab.map(w2 => pHo(trainHo)(h, w2)).sum
      assert(math.abs(total - 1.0) < 1e-12, s"sum for history '$h' = $total")
    }
    // a history outside the model (never starts a train bigram) falls
    // back to the continuation distribution — also sums to 1
    val total = vocab.map(w2 => pHo(trainHo)("never-seen", w2)).sum
    assert(math.abs(total - 1.0) < 1e-12, s"fallback sum = $total")
  }

  test("q293 matches the hand model, counts OOV tokens, and never scores -inf") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-knho").toString
    // doc_ids: train = 1..9 mod-10 nonzero; eval = 10, 20 (mod-10 zero)
    // eval exercises: seen bigram, unseen bigram of seen words, OOV
    // tokens (xyz/qqq → <unk>) at first and interior positions
    val docs = Seq(
      (1L, trainHo(0)), (2L, trainHo(1)), (3L, trainHo(2)),
      (10L, "a b c xyz a"), (20L, "qqq a c b"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val p = pHo(trainHo) _
    val got = LangModel.q293KnHeldOut(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getFloat(r.fieldIndex("avg_logprob_kn_ho")))).toMap
    for ((id, text) <- docs.filter(_._1 % 10 == 0)) {
      val w = text.split(" ")
      val lps = w.dropRight(1).zip(w.drop(1)).map { case (a, b) => math.log(p(a, b)) }
      assert(lps.forall(v => !v.isInfinite && !v.isNaN))
      val (kept, _, _, _, _, _, _) = modelHo(trainHo)
      val wantOov = w.count(t => !kept(t)).toLong
      val want = lps.sum / lps.length
      assert(got(id)._1 == lps.length.toLong)
      assert(got(id)._2 == wantOov, s"doc $id oov: ${got(id)._2} vs $wantOov")
      assert(math.abs(got(id)._3 - want) < 1e-6, s"doc $id: ${got(id)._3} vs $want")
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

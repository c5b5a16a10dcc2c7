package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q250/q251 unigram-LM (SentencePiece-style, Kudo 2018 hard-EM)
  * tokenizer training: a hand-computed micro-corpus segmentation pin,
  * and a full independent plain-Scala reference implementation of the
  * seed → EM → prune loop compared round-by-round against the Spark
  * frames (both share the JVM's Math.log, so the micro-nat
  * quantization is bit-identical by construction).
  */
class UnigramSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-unigram").toString
    rows.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  // ---- independent reference implementation (no Spark) ----

  private val MaxPiece = LangModel.UnigramMaxPiece
  private val Cap = LangModel.UnigramCap

  private def qlp(c: Long, t: Double): Long =
    math.floor((math.log(c.toDouble) - math.log(t)) * 1e6).toLong

  /** (score, j)-lexicographic-argmax Viterbi, the spec's own. */
  private def refViterbi(word: String, mp: Map[String, Long]): (Long, String) = {
    val n = word.length
    val score = Array.ofDim[Long](n + 1)
    val seg = Array.ofDim[String](n + 1)
    seg(0) = ""
    for (i <- 1 to n) {
      var best: Option[(Long, Int)] = None
      for (j <- math.max(0, i - MaxPiece) until i) {
        mp.get(word.substring(j, i)).foreach { q =>
          val cand = (score(j) + q, j)
          if (best.forall(b => cand._1 > b._1 || (cand._1 == b._1 && cand._2 > b._2)))
            best = Some(cand)
        }
      }
      val (s, j) = best.get // single chars are always in the vocabulary
      score(i) = s
      seg(i) = seg(j) + word.substring(j, i) + "|"
    }
    (score(n), seg(n))
  }

  private def topMulti(counts: Map[String, Long]): Seq[(String, Long)] =
    counts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(Cap)

  /** Full reference training loop mirroring unigramTrainFrames:
    * returns per-round (n_pieces, viterbi_tokens, loglik_micro) and
    * the final round's word → (score, seg).
    */
  private def refTrain(wordFreqs: Map[String, Long], rounds: Int)
      : (Seq[(Long, Long, Long)], Map[String, (Long, String)],
         Map[String, Long]) = {
    val subs = wordFreqs.toSeq.flatMap { case (w, f) =>
      for {
        l <- 1 to math.min(w.length, MaxPiece)
        p <- 0 to w.length - l
      } yield (w.substring(p, p + l), f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val chars = subs.keySet.filter(_.length == 1)
    var vocab: Map[String, Long] =
      subs.filter(_._1.length == 1) ++ topMulti(subs)
    var lastVit: Map[String, (Long, String)] = Map.empty
    var lastMp: Map[String, Long] = Map.empty
    val rows = (1 to rounds).map { _ =>
      val t = vocab.values.sum.toDouble
      val mp = vocab.map { case (p, c) => p -> qlp(c, t) }
      lastMp = mp
      lastVit = wordFreqs.map { case (w, _) => w -> refViterbi(w, mp) }
      val used = lastVit.toSeq.flatMap { case (w, (_, seg)) =>
        seg.split("[|]").filter(_.nonEmpty).map(p => (p, wordFreqs(w)))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val summary = (
        vocab.size.toLong,
        lastVit.map { case (w, (_, seg)) =>
          wordFreqs(w) * seg.count(_ == '|').toLong }.sum,
        lastVit.map { case (w, (s, _)) => wordFreqs(w) * s }.sum)
      vocab = chars.map(c => c -> math.max(used.getOrElse(c, 0L), 1L)).toMap ++
        topMulti(used)
      summary
    }
    (rows, lastVit, lastMp)
  }

  // ---- tests ----

  test("hand-computed round 1: 'aa' segments a|a (2·ln(5/9) > ln(2/9)) while " +
    "'ab' keeps the whole piece (ln(1/9) > ln(5/9)+ln(1/9))") {
    // corpus: 'aa aa ab' → word freqs aa:2 ab:1; seed counts
    // a:5 b:1 aa:2 ab:1, T=9 — the two argmaxes above, by hand
    val tmp = writeDocs(Seq((0L, "aa aa ab", "web")))
    val (_, vit, _) = LangModel.unigramTrainFrames(spark, tmp, 1)
    val got = vit.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got("aa")._2 == "a|a|")
    assert(got("ab")._2 == "ab|")
    // and the scores are the quantized sums they should be
    assert(got("aa")._1 == 2L * qlp(5, 9.0))
    assert(got("ab")._1 == qlp(1, 9.0))
  }

  test("the EM loop matches the independent reference round-by-round on a " +
    "mixed micro corpus (summaries AND final segmentations)") {
    val text1 = "the cat sat on the mat the cat ran"
    val text2 = "banana bandana ban can cabana banana"
    val tmp = writeDocs(Seq((0L, text1, "web"), (1L, text2, "book")))
    val wordFreqs = (text1.split(" ") ++ text2.split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rounds = LangModel.UnigramRounds
    val (refRows, refVit, _) = refTrain(wordFreqs, rounds)

    val got = LangModel.q250UnigramTrain(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to rounds).toSeq)
    got.foreach { case (r, np, vt, ll) =>
      val (rnp, rvt, rll) = refRows(r.toInt - 1)
      assert(np == rnp, s"round $r n_pieces")
      assert(vt == rvt, s"round $r viterbi_tokens")
      assert(ll == rll, s"round $r loglik_micro")
    }
    val (_, vit, _) = LangModel.unigramTrainFrames(spark, tmp, rounds)
    val segs = vit.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(segs == refVit.view.mapValues(_._2).toMap)
  }

  test("q254 n-best lattice matches EXHAUSTIVE segmentation enumeration " +
    "(top-N by score DESC, seg ASC) and rank 1 carries the Viterbi score") {
    val text1 = "the cat sat on the mat the cat ran"
    val text2 = "banana bandana ban can cabana banana"
    val tmp = writeDocs(Seq((0L, text1, "web"), (1L, text2, "book")))
    val wordFreqs = (text1.split(" ") ++ text2.split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rounds = LangModel.UnigramRounds
    val nBest = LangModel.UnigramNBest
    val (_, refVit, mp) = refTrain(wordFreqs, rounds)
    // exhaustive: every segmentation of `word` into vocabulary pieces
    def allSegs(word: String): Seq[(Long, String)] = {
      def go(i: Int): Seq[(Long, String)] =
        if (i == word.length) Seq((0L, ""))
        else (1 to math.min(MaxPiece, word.length - i)).flatMap { l =>
          val p = word.substring(i, i + l)
          mp.get(p).toSeq.flatMap(q =>
            go(i + l).map { case (s, seg) => (s + q, p + "|" + seg) })
        }
      go(0)
    }
    val refNbest: Map[String, Seq[(Long, String)]] = wordFreqs.keys.map { w =>
      w -> allSegs(w).sortBy { case (s, seg) => (-s, seg) }.take(nBest)
    }.toMap
    // rank 1 score is the Viterbi optimum for every word
    refNbest.foreach { case (w, best) =>
      assert(best.head._1 == refVit(w)._1, s"rank-1 score for '$w'")
    }
    // expected per-rank aggregate rows
    val want = (1 to nBest).flatMap { r =>
      val withR = wordFreqs.toSeq.filter { case (w, _) => refNbest(w).size >= r }
      if (withR.isEmpty) None else Some((r.toLong,
        withR.size.toLong,
        withR.map(_._2).sum,
        withR.map { case (w, f) => f * refNbest(w)(r - 1)._2.count(_ == '|').toLong }.sum,
        withR.map { case (w, f) => f * refNbest(w)(r - 1)._1 }.sum))
    }
    val got = LangModel.q254UnigramNbest(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // sanity: the lattice is non-degenerate (some word has > 1 candidate)
    assert(refNbest.values.exists(_.size > 1))
  }

  test("training-curve sanity on the real corpus: vocabulary bounded, token " +
    "count never exceeds characters, likelihood is negative and finite") {
    val dir = "/root/testdata/sf0.001"
    val rows = LangModel.q250UnigramTrain(spark, dir).collect()
    assert(rows.length == LangModel.UnigramRounds)
    rows.foreach { r =>
      val (np, vt, ll) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(np > 0 && vt > 0)
      assert(ll < 0L, "log-likelihood must be negative in micro-nats")
    }
    val enc = LangModel.q251UnigramEncode(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), "chars >= tokens (pieces are >= 1 char)")
      assert(r.getDouble(4) >= 1.0)
    }
  }
}

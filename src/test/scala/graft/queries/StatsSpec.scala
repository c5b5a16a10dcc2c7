package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Stats family: each statistic is pinned to a closed-form fixture
  * where the exact answer is known (chi2 = 0 under perfect
  * independence, KS ∈ {0, 1} for identical/disjoint samples, KL = 0
  * for an identical distribution, Pearson = 1 for an exact shift), plus
  * shape sanity on the real sf0.001 tables.
  */
class StatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q143: perfectly independent contingency table scores chi2 = 0") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-chi2").toString
    // 2 langs x 2 sources, every cell the same count -> independence
    val rows = for {
      lang <- Seq("en", "de"); source <- Seq("s0", "s1"); i <- 1 to 5
    } yield (lang, source, i.toLong, s"doc $lang $source $i")
    rows.toDF("lang", "source", "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Stats.q143Chi2Indep(spark, tmp).collect().head
    assert(r.getAs[Long]("n_docs") == 20L)
    assert(r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Float]("chi2") == 0.0f)
  }

  test("q143: real-data shape — grid covers the full lang x source product") {
    val r = Stats.q143Chi2Indep(spark, dir).collect().head
    assert(r.getAs[Long]("n_cells") ==
      r.getAs[Long]("n_langs") * r.getAs[Long]("n_sources"))
    assert(r.getAs[Float]("chi2") >= 0.0f)
  }

  test("q144: identical samples give D = 0; disjoint samples give D = 1") {
    import spark.implicits._
    val same = Files.createTempDirectory("graft-ks1").toString
    ((1 to 10).map(i => (i.toDouble, "1-URGENT")) ++
      (1 to 10).map(i => (i.toDouble, "5-LOW")))
      .toDF("o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$same/orders.parquet")
    val r1 = Stats.q144KsDrift(spark, same).collect().head
    assert(r1.getAs[Double]("ks_d") == 0.0)
    assert(!r1.getAs[Boolean]("drifted"))

    val apart = Files.createTempDirectory("graft-ks2").toString
    ((1 to 10).map(i => (i.toDouble, "1-URGENT")) ++
      (1 to 10).map(i => (100.0 + i, "5-LOW")))
      .toDF("o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$apart/orders.parquet")
    val r2 = Stats.q144KsDrift(spark, apart).collect().head
    assert(r2.getAs[Double]("ks_d") == 1.0)
    assert(r2.getAs[Boolean]("drifted"))
  }

  test("q144: D is invariant under the range-partition count") {
    val d4 = Stats.q144KsDrift(spark, dir, parts = 4).collect().head
    val d32 = Stats.q144KsDrift(spark, dir, parts = 32).collect().head
    assert(d4.getAs[Double]("ks_d") == d32.getAs[Double]("ks_d"))
    assert(d4.getAs[Long]("n_a") + d4.getAs[Long]("n_b") ==
      graft.sources.Tables.load(spark, dir, "orders").count())
  }

  test("q145: digit masses and proportions are consistent on real data") {
    import spark.implicits._
    val rows = Stats.q145Benford(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("lead_digit")).toSeq ==
      rows.map(_.getAs[Int]("lead_digit")).toSeq.sorted)
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("lead_digit"))))
    val total = graft.sources.Tables.load(spark, dir, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == total)
    assert(math.abs(rows.map(_.getAs[Double]("obs_p")).sum - 1.0) < 1e-9)
    // Benford masses are the closed form, and sum to 1 over digits 1-9
    rows.foreach { r =>
      val d = r.getAs[Int]("lead_digit")
      assert(math.abs(r.getAs[Float]("benford_p") -
        math.log10(1.0 + 1.0 / d)) < 1e-6)
    }
    val chi2 = rows.map(_.getAs[Float]("chi2")).distinct
    assert(chi2.length == 1 && chi2.head >= 0.0f)
  }

  test("q146: a source with the corpus's own distribution has KL = 0") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-kl").toString
    // two sources, identical token multisets -> each equals the blend
    Seq((1L, "a b b c", "s0"), (2L, "a b b c", "s1"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Stats.q146KlSource(spark, tmp).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Float]("kl") == 0.0f)
      assert(r.getAs[Long]("n_types") == 3L)
      assert(r.getAs[Long]("n_tokens") == 4L)
    }
  }

  test("q146: real data — KL nonnegative per source, types bounded by vocab") {
    val rows = Stats.q146KlSource(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Float]("kl") >= 0.0f))
  }

  test("q147: an exact 2-day shift scores Pearson 1 at lag 2") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-xc").toString
    val counts = Seq(1, 3, 2, 5, 4, 7, 6, 2, 8, 3)
    val clicks = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i => (s"2024-01-${"%02d".format(d + 1)} 01:00:00", "click"))
    }
    val buys = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i => (s"2024-01-${"%02d".format(d + 3)} 01:00:00", "purchase"))
    }
    (clicks ++ buys).toDF("ts_s", "event_type")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val byLag = Stats.q147Xcorr(spark, tmp).collect()
      .map(r => r.getAs[Int]("lag") -> r).toMap
    assert(byLag(2).getAs[Double]("xcorr") == 1.0)
    assert(byLag(2).getAs[Long]("n_days") == 10L)
    assert(byLag(0).getAs[Double]("xcorr") < 1.0)
  }

  test("q151: a clean split — even users convert, odd never — is significant") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ab").toString
    val rows = (0L until 40L).map { u =>
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      (u, t, u, if (u % 2 == 0) "purchase" else "click")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Stats.q151AbTest(spark, tmp).collect().head
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    assert(r.getAs[Double]("rate_a") == 1.0 && r.getAs[Double]("rate_b") == 0.0)
    assert(r.getAs[Boolean]("significant"))
  }

  test("q152: equal supplies score gini exactly 0") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-gini").toString
    (1 to 4).map(i => (i.toLong, s"s$i", "a b c d e"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Stats.q152Gini(spark, tmp).collect().head
    assert(r.getAs[Long]("n_sources") == 4L)
    assert(r.getAs[Double]("gini") == 0.0)
  }

  test("q152: real data — gini in [0, 1)") {
    val g = Stats.q152Gini(spark, dir).collect().head.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
  }

  test("q153: each source's extremes land on the global extremes") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-qn").toString
    // source a sits low (10,20,30), source b high (100,200,300): after
    // normalization both spread across the GLOBAL range [10, 300]
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L), (5L, "b", 200L), (6L, "b", 300L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Stats.q153QuantileNorm(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("qnorm")).toMap
    assert(rows(1) == 10.0 && rows(3) == 300.0)   // a's min/max -> global
    assert(rows(4) == 10.0 && rows(6) == 300.0)   // b's min/max -> global
    assert(rows(2) == rows(5))                    // same fraction, same value
  }

  test("q153: result is invariant under the range-partition count") {
    val p4 = Stats.q153QuantileNorm(spark, dir, parts = 4).collect().toSeq
    val p32 = Stats.q153QuantileNorm(spark, dir, parts = 32).collect().toSeq
    assert(p4 == p32 && p4.nonEmpty)
  }

  test("q154: reference days score calm; a shifted day trips the line") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-psi").toString
    // days 1-7: one event per bin center (matches the reference, which
    // IS those days); day 8: all mass in the top bin
    val calm = for (day <- 1 to 7; i <- 0 until 10) yield
      (s"2024-01-${"%02d".format(day)} 06:00:00", 25.0 + 50 * i)
    val hot = (0 until 10).map(_ => ("2024-01-08 06:00:00", 475.0))
    (calm ++ hot).toDF("ts_s", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = Stats.q154PsiDaily(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Float]("psi"), r.getAs[Boolean]("drifted"))).toMap
    (1 to 7).foreach { d =>
      val (psi, drifted) = rows(s"2024-01-0$d")
      assert(psi < 0.1f && !drifted)
    }
    val (psi8, drifted8) = rows("2024-01-08")
    assert(psi8 > 0.2f && drifted8)
  }

  test("q156: weighted percentiles sit where the token mass sits") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wp").toString
    def doc(id: Long, chars: Long, toks: Int) =
      (id, Seq.fill(toks)("t").mkString(" "), chars)
    // token mass: 1 + 1 + 8 — the median and p90 TOKEN live in doc 3
    Seq(doc(1, 10, 1), doc(2, 20, 1), doc(3, 30, 8))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Stats.q156WeightedPctl(spark, tmp).collect().head
    assert(r.getAs[Long]("total_w") == 10L)
    assert(r.getAs[Long]("p50_weighted") == 30L)
    assert(r.getAs[Long]("p90_weighted") == 30L)
    // flipped mass: 5 + 4 + 1 — median token in the smallest doc
    val tmp2 = Files.createTempDirectory("graft-wp2").toString
    Seq(doc(1, 10, 5), doc(2, 20, 4), doc(3, 30, 1))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    val r2 = Stats.q156WeightedPctl(spark, tmp2).collect().head
    assert(r2.getAs[Long]("p50_weighted") == 10L)
    assert(r2.getAs[Long]("p90_weighted") == 20L)
  }

  test("q156: invariant under the range-partition count") {
    val a = Stats.q156WeightedPctl(spark, dir, parts = 3).collect().toSeq
    val b = Stats.q156WeightedPctl(spark, dir, parts = 32).collect().toSeq
    assert(a == b)
  }

  test("q202: Lorenz curve is monotone, convex, below the diagonal, ends at (1,1)") {
    val rows = Stats.q202Lorenz(spark, dir).collect().sortBy(_.getAs[Long]("ventile"))
    assert(rows.length == 20)
    assert(rows.last.getAs[Double]("pop_share") == 1.0)
    assert(rows.last.getAs[Double]("rev_share") == 1.0)
    rows.foreach { r =>
      // sorted ascending by revenue: cumulative revenue share can never
      // exceed cumulative population share
      assert(r.getAs[Double]("rev_share") <= r.getAs[Double]("pop_share") + 1e-12)
    }
    val pop = rows.map(_.getAs[Double]("pop_share"))
    val rev = rows.map(_.getAs[Double]("rev_share"))
    assert(pop.zip(pop.tail).forall { case (a, b) => b > a })
    assert(rev.zip(rev.tail).forall { case (a, b) => b >= a })
    // NOTE: per-ventile increments are NOT asserted convex — floor
    // boundaries make bin sizes alternate (e.g. 7 vs 8 customers), so a
    // smaller later bin can legitimately add less than a larger earlier one
  }

  test("q202: invariant under the range-partition count") {
    val a = Stats.q202Lorenz(spark, dir, parts = 3).collect().toSeq
    val b = Stats.q202Lorenz(spark, dir, parts = 32).collect().toSeq
    assert(a == b)
  }

  test("q207: trimmed mean drops exactly the 5% tails and matches a driver recompute") {
    val r = Stats.q207TrimmedMean(spark, dir).collect().head
    val vs = graft.sources.Tables.load(spark, dir, "orders")
      .select("o_totalprice", "o_orderkey").collect()
      .map(x => (BigDecimal(x.getDouble(0)).setScale(2), x.getLong(1))).sorted
    val n = vs.length
    val cut = n * 5 / 100
    val kept = vs.slice(cut, n - cut).map(_._1)
    assert(r.getAs[Long]("n_total") == n && r.getAs[Long]("n_kept") == n - 2 * cut)
    assert(r.getAs[Double]("trimmed_mean") == kept.sum.toDouble / kept.length)
    assert(r.getAs[Double]("raw_mean") == vs.map(_._1).sum.toDouble / n)
  }

  test("q207: invariant under the range-partition count") {
    val a = Stats.q207TrimmedMean(spark, dir, parts = 3).collect().toSeq
    val b = Stats.q207TrimmedMean(spark, dir, parts = 32).collect().toSeq
    assert(a == b)
  }

  test("q208: every pair appears once with a valid correlation; one pair recomputes") {
    val rows = Stats.q208CorrMatrix(spark, dir).collect()
    assert(rows.length == 10) // C(5,2) event types
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
    // driver recompute for one pair
    val daily = graft.sources.Tables.load(spark, dir, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val ca = daily.filter(_._1 == "click").map(d => d._2 -> d._3).toMap
    val cb = daily.filter(_._1 == "error").map(d => d._2 -> d._3).toMap
    val days = ca.keySet & cb.keySet
    val xs = days.toSeq.map(ca); val ys = days.toSeq.map(cb)
    val nd = days.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = days.toSeq.map(d => ca(d) * cb(d)).sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val expect = (nd * sxy - sx * sy).toDouble /
      math.sqrt((nd * sxx - sx * sx).toDouble * (nd * syy - sy * sy))
    val gotPair = rows.find(r => r.getString(0) == "click" && r.getString(1) == "error").get
    assert(gotPair.getAs[Long]("nd") == nd)
    assert(math.abs(gotPair.getAs[Double]("corr") - expect) < 1e-12)
  }

  test("q214: the reported keys are truly the heaviest; shares are consistent") {
    val rows = Stats.q214SkewReport(spark, dir).collect()
    assert(rows.length == 10)
    val counts = graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRows = counts.values.sum
    val ms = rows.map(_.getAs[Long]("multiplicity"))
    assert(ms.zip(ms.tail).forall { case (a, b) => a >= b })
    // nothing outside the report is heavier than its minimum
    val floor10 = ms.min
    val reported = rows.map(_.getLong(0)).toSet
    assert(counts.filterNot(kv => reported(kv._1)).values.forall(_ <= floor10))
    rows.foreach { r =>
      assert(counts(r.getLong(0)) == r.getAs[Long]("multiplicity"))
      assert(r.getAs[Double]("row_share") ==
        r.getAs[Long]("multiplicity").toDouble / nRows)
      assert(r.getAs[Long]("n_keys") == counts.size)
    }
  }

  test("q205: Welch t matches a driver recompute; groups partition the table") {
    val r = Stats.q205WelchT(spark, dir).collect().head
    val rows = graft.sources.Tables.load(spark, dir, "orders")
      .select("o_totalprice", "o_orderpriority").collect()
      .map(x => (BigDecimal(x.getDouble(0)).setScale(2), x.getString(1) == "1-URGENT"))
    val (ga, gb) = rows.partition(_._2)
    assert(r.getAs[Long]("na") == ga.length && r.getAs[Long]("nb") == gb.length)
    def stats(xs: Array[BigDecimal]) = {
      val n = xs.length
      val s = xs.sum
      val q = xs.map(x => x * x).sum
      val m = s.toDouble / n
      (n, m, (q.toDouble - s.toDouble * s.toDouble / n) / (n - 1))
    }
    val (na, ma, va) = stats(ga.map(_._1))
    val (nb, mb, vb) = stats(gb.map(_._1))
    assert(r.getAs[Double]("mean_a") == ma && r.getAs[Double]("mean_b") == mb)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(math.abs(r.getAs[Float]("t") - t) < 1e-4, s"t=${r.getAs[Float]("t")} vs $t")
    assert(r.getAs[Float]("df") > math.min(na, nb) - 1 - 1e-3)
    assert(r.getAs[Float]("df") <= na + nb - 2 + 1e-3)
  }

  test("q147: real data — 8 lags, day frames shrink by one per lag") {
    val rows = Stats.q147Xcorr(spark, dir).collect()
    assert(rows.length == 8)
    val n0 = rows.head.getAs[Long]("n_days")
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_days") == n0 - i)
      assert(math.abs(r.getAs[Double]("xcorr")) <= 1.0)
    }
  }

  test("q237: folds partition the users, k is the conformal order index, " +
    "coverage bookkeeping holds and lands near the 90% target") {
    import spark.implicits._
    // sf0.01: sf0.001 has only ~15 users, which exercises the k-clamp
    // corner rather than the estimator — checked separately below
    val d01 = "/root/testdata/sf0.01"
    val r = Stats.q237Conformal(spark, d01).collect().head
    val nUsers = graft.sources.Tables.load(spark, d01, "events")
      .select($"user_id").distinct().count()
    val (nTr, nCal, nTe) = (r.getAs[Long]("n_train"),
      r.getAs[Long]("n_cal"), r.getAs[Long]("n_test"))
    assert(nTr + nCal + nTe == nUsers)
    assert(nTr > 0 && nCal > 0 && nTe > 0)
    // k = min(ceil(0.9 * (n_cal + 1)), n_cal) — the split-conformal order index
    assert(r.getAs[Long]("k") ==
      math.min(math.ceil(0.9 * (nCal + 1)).toLong, nCal))
    assert(r.getAs[Long]("k") >= 1 && r.getAs[Long]("k") <= nCal)
    val covered = r.getAs[Long]("n_covered")
    assert(math.abs(r.getAs[Float]("coverage") - covered.toDouble / nTe) < 1e-6)
    assert(r.getAs[Float]("qhat") >= 0.0f)
    // marginal validity: realized coverage must sit near the 1-α target
    // (small-fold noise band — the guarantee is ≥ 0.9 in expectation)
    val cov = r.getAs[Float]("coverage")
    assert(cov >= 0.75f && cov <= 1.0f, s"coverage=$cov")
  }

  test("q237: tiny calibration fold clamps k to n_cal instead of emitting nothing") {
    val r = Stats.q237Conformal(spark, dir).collect()
    assert(r.length == 1) // sf0.001: 15 users — the clamp corner is live
    assert(r.head.getAs[Long]("k") == r.head.getAs[Long]("n_cal"))
  }
}

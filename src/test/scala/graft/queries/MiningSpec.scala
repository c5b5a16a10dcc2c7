package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomMightContain
import org.apache.spark.util.sketch.BloomFilter

/** q160-q163 (runtime-filter join, association rules, CUSUM, RFM):
  * each pinned to a fixture whose exact answer is known, plus the
  * operator's defining law on real sf0.001 data.
  */
class MiningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom_might_contain: no false negatives; serialized round-trip") {
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 1000L by 2).foreach(bf.putLong)
    val bytes = BloomMightContain.serialize(bf)
    val back = BloomMightContain.deserialize(bytes)
    (0L until 1000L by 2).foreach(k => assert(back.mightContainLong(k)))
    // FPR sanity on odd (absent) keys: ~1%, assert well under 10%
    val fps = (1L until 1000L by 2).count(back.mightContainLong)
    assert(fps < 50, s"FPR too high: $fps/500")
  }

  test("q160: bloom-prefiltered semi join equals the plain semi join") {
    import spark.implicits._
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n_items"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = RuntimeFilter.q160BloomJoin(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_items"))
      .toMap
    assert(got == plain)
  }

  test("q160: the bloom prunes most non-joining probe rows pre-join") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val n = o.count()
    val bf = o.stat.bloomFilter("o_orderkey", math.max(n, 1), 0.01)
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val total = li.count()
    val kept = li.filter(call_function("bloom_might_contain",
      $"l_orderkey", lit(BloomMightContain.serialize(bf)))).count()
    val joining = li.join(o, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    // lossless below, effective above: keeps all joining rows and at
    // most joining + 2.5% of the rest (1% nominal FPR, with slack)
    assert(kept >= joining)
    assert(kept <= joining + ((total - joining) * 0.025).toLong + 5)
  }

  test("q161: pair counts vs a hand-built two-basket fixture") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-assoc").toString
    // items 1,2 co-occur in both baskets; item 3 only in basket 1.
    // minItemCnt=2 prunes nothing for items 1,2; prunes item 3.
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val rows = Association.q161AssocRules(spark, tmp,
      minItemCnt = 2L, minPairCnt = 2L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("p1") == 1L && r.getAs[Long]("p2") == 2L)
    assert(r.getAs[Long]("pair_cnt") == 2L)
    assert(r.getAs[Double]("support") == 1.0)
    assert(r.getAs[Double]("conf_1_2") == 1.0)
    assert(r.getAs[Double]("conf_2_1") == 1.0)
    // lift = 2*2/(2*2) = 1
    assert(r.getAs[Double]("lift") == 1.0)
  }

  test("q161: real-data laws — confidence bounds and symmetry") {
    val rows = Association.q161AssocRules(spark, dir,
      minItemCnt = 2L, minPairCnt = 2L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pc, c1, c2) = (r.getAs[Long]("pair_cnt"),
        r.getAs[Long]("cnt1"), r.getAs[Long]("cnt2"))
      assert(pc <= c1 && pc <= c2, "a pair cannot outnumber its items")
      assert(r.getAs[Double]("conf_1_2") <= 1.0 + 1e-12)
      assert(r.getAs[Double]("conf_2_1") <= 1.0 + 1e-12)
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"), "unordered pairs once")
    }
  }

  test("q162: flat series has cusum 0 everywhere; a step change peaks at the step") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cusum").toString
    // 4 days at 2/day then 4 days at 6/day: |CUSUM| peaks on day 4
    val rows = for {
      d <- 1 to 8; i <- 1 to (if (d <= 4) 2 else 6)
    } yield (java.sql.Timestamp.valueOf(f"2024-01-0$d 10:0$i:00"),
      "purchase", 1L, i.toDouble, d.toLong * 100 + i)
    rows.toDF("ts", "event_type", "user_id", "value", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Timeseries.q162Cusum(spark, tmp).collect()
    assert(out.length == 8)
    // total drift returns to zero on the last day by construction
    assert(math.abs(out.last.getAs[Double]("cusum")) < 1e-9)
    val peak = out.filter(_.getAs[Boolean]("is_peak")).map(
      _.getAs[java.sql.Date]("d").toString)
    assert(peak.toSeq == Seq("2024-01-04"))
  }

  test("q162: real data — cumulative counts are monotone and end at the total") {
    val out = Timeseries.q162Cusum(spark, dir).collect()
    assert(out.nonEmpty)
    val cums = out.map(_.getAs[Long]("cum_c"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(cums.last == out.map(_.getAs[Long]("c")).sum)
    assert(out.count(_.getAs[Boolean]("is_peak")) >= 1)
  }

  test("jaro_winkler: classic published values, boost threshold, degenerate cases") {
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinkler.similarity(a.getBytes, b.getBytes)
    assert(jw("martha", "marhta") == 0.9611111111111111)   // Winkler's example
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    // prefix boost suppressed when jaro <= 0.7 (the DuckDB convention)
    assert(jw("abcdefgh", "abzyxwvu") == 0.5)
    assert(jw("crate", "trace") == 0.7333333333333334)     // no common prefix
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0)                          // window 0: no matches
  }

  test("q164: pairs are ordered, above threshold, and include near-identical names") {
    val rows = Entity.q164JaroWinkler(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("name1") < r.getAs[String]("name2"))
      val sim = r.getAs[Float]("jw")
      assert(sim >= 0.75f && sim <= 1.0f)
    }
  }

  test("q165: hand-computed time-weighted average on an irregular series") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-twa").toString
    def ns(sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d").getTime * 1000000L
    // value 10 held 10s, value 20 held 20s, final value never counted:
    // twa = (10*10 + 20*20)/30 = 16.666..
    Seq((1L, ns(0), 10.0, "view", 1L), (1L, ns(10), 20.0, "view", 2L),
      (1L, ns(30), 99.0, "view", 3L))
      .toDF("user_id", "ts", "value", "event_type", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Timeseries.q165TimeWeighted(spark, tmp).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_intervals") == 2L)
    assert(r.head.getAs[Long]("total_dur_us") == 30000000L)
    assert(math.abs(r.head.getAs[Double]("twa") - 500.0 / 30.0) < 1e-12)
  }

  test("q166: fused scores are bounded and docs in both lists outrank single-list docs with same ranks") {
    val rows = Ranking.q166Rrf(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rrf = r.getAs[Double]("rrf")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-12)
      val lex = Option(r.getAs[Any]("lex_rank"))
      val sem = Option(r.getAs[Any]("sem_rank"))
      assert(lex.nonEmpty || sem.nonEmpty)
    }
    // output sorted by fused score descending
    val scores = rows.map(_.getAs[Double]("rrf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // each doc appears exactly once
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("q167: sketch set algebra satisfies inclusion-exclusion and bounds") {
    val r = Analytic.q167SketchSetOps(spark, dir).collect().head
    val (a, b) = (r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))
    val (u, i) = (r.getAs[Long]("n_union"), r.getAs[Long]("n_intersect"))
    assert(u == a + b - i)
    assert(u >= math.max(a, b) && u <= a + b)
    assert(i >= 0 && i <= math.min(a, b))
    assert(a > 0 && b > 0)
  }

  test("q168: triangle inequality fixture — relaxation finds the cheaper 2-hop path") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sp").toString
    // baskets engineered so pair counts give: direct edge 1-2 weight
    // 998 (cnt 2), edges 1-3 and 3-2 weight 997 each (cnt 3):
    // shortest 1->2 = 2*997 = 1994 < 998?? no: 1994 > 998, so direct
    // wins; instead make direct cnt 2 (w 998) vs hops 1-3 (cnt 450 ->
    // w 550) + 3-2 (cnt 450 -> w 550): 1100 > 998 still. Weighted
    // shortness needs SUM below the direct edge: w = 1000 - cnt, so
    // two hops beat one iff 2000 - c13 - c32 < 1000 - c12, i.e. the
    // indirect counts sum must exceed 1000 + c12. Build c13 = c32 =
    // 600, c12 = 2.
    def basket(id: Long, parts: Seq[Long]) = parts.map(p => (id, p))
    val rows =
      (1L to 600L).flatMap(i => basket(1000 + i, Seq(1L, 3L))) ++
      (1L to 600L).flatMap(i => basket(3000 + i, Seq(3L, 2L))) ++
      (1L to 2L).flatMap(i => basket(5000 + i, Seq(1L, 2L)))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Graphs.q168ShortestPath(spark, tmp).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    // every node has degree 2 -> tie -> source is node 1; the direct
    // 1-2 edge costs 998 but 1-3-2 costs 400+400: relaxation must
    // prefer the cheaper two-hop path
    assert(out(1L) == 0L)
    assert(out(3L) == 400L) // 1000 - 600
    assert(out(2L) == 800L) // via node 3, beats the 998 direct edge
  }

  test("q169: OHLC equals the chronological first/last and min/max per bucket") {
    val rows = Timeseries.q169Ohlc(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h)
      assert(l <= c && c <= h)
      assert(r.getAs[Long]("n_events") >= 1L)
    }
  }

  test("q170: canonical keeper is the smallest member and families have >= 2 docs") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-norm").toString
    Seq(
      (1L, "Hello, World! More text here A"),
      (2L, "hello  world more TEXT here b"),   // same normalized prefix
      (3L, "entirely different content paragraph"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fams = TextOps.q170NormDedup(spark, tmp, words = 5).collect()
    assert(fams.length == 1)
    assert(fams.head.getAs[Long]("canonical_id") == 1L)
    assert(fams.head.getAs[Long]("n_docs") == 2L)
    // real data: every family >= 2, keeper is a real doc id
    val real = TextOps.q170NormDedup(spark, dir).collect()
    real.foreach(r => assert(r.getAs[Long]("n_docs") >= 2L))
  }

  test("q171: Wilson intervals contain p_hat, stay in [0,1], and shrink with n") {
    val rows = Stats.q171WilsonCi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("p_hat"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo >= 0.0 && hi <= 1.0)
      assert(lo <= p && p <= hi)
      assert(hi - lo > 0.0)
    }
  }

  test("q172: balanced identical samples give U = na*nb/2 and z = 0") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mwu").toString
    // both groups hold exactly the values 1..10 -> distributions equal
    ((1 to 10).map(i => (i.toDouble, "1-URGENT")) ++
      (1 to 10).map(i => (i.toDouble, "5-LOW")))
      .toDF("o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Stats.q172MannWhitney(spark, tmp).collect().head
    assert(r.getAs[Long]("na") == 10L && r.getAs[Long]("nb") == 10L)
    assert(r.getAs[Double]("u") == 50.0) // na*nb/2
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("q172: a fully shifted sample saturates U and z is large") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mwu2").toString
    ((1 to 10).map(i => (100.0 + i, "1-URGENT")) ++
      (1 to 10).map(i => (i.toDouble, "5-LOW")))
      .toDF("o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Stats.q172MannWhitney(spark, tmp).collect().head
    assert(r.getAs[Double]("u") == 100.0) // every A beats every B
    assert(r.getAs[Double]("z") > 3.0)
  }

  test("q173: the backtest scores only held-out transitions and accuracy is consistent") {
    val rows = Behavior.q173MarkovBacktest(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_test"), r.getAs[Long]("n_correct"))
      assert(c >= 0 && c <= n)
      assert(r.getAs[Double]("accuracy") == c.toDouble / n)
      assert(r.getAs[String]("predicted") != null,
        "every test prev-state was seen in training on this data")
    }
  }

  test("q174: resurrection day gaps exceed the threshold; a tight threshold finds more") {
    val loose = Behavior.q174Resurrected(spark, dir, gapDays = 2).collect()
    loose.foreach { r =>
      assert(r.getAs[Long]("min_gap") > 2L)
      assert(r.getAs[Long]("max_gap") >= r.getAs[Long]("min_gap"))
    }
    val tight = Behavior.q174Resurrected(spark, dir, gapDays = 1).collect()
    assert(tight.map(_.getAs[Long]("n_resurrected")).sum >=
      loose.map(_.getAs[Long]("n_resurrected")).sum)
  }

  test("q175: independent table has MI ~ 0; identical margins bound entropies") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mi").toString
    val rows = for {
      lang <- Seq("en", "de"); source <- Seq("s0", "s1"); i <- 1 to 5
    } yield (lang, source, i.toLong, "t")
    rows.toDF("lang", "source", "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Stats.q175MutualInfo(spark, tmp).collect().head
    assert(math.abs(r.getAs[Float]("mi")) < 1e-6f)
    // uniform 2x2: H = ln 2 each, joint = ln 4
    assert(math.abs(r.getAs[Float]("h_lang") - math.log(2)) < 1e-6)
    assert(math.abs(r.getAs[Float]("h_joint") - math.log(4)) < 1e-6)
    // real data: 0 <= MI <= min entropy side, NMI in [0, 1]
    val real = Stats.q175MutualInfo(spark, dir).collect().head
    assert(real.getAs[Float]("mi") >= -1e-6f)
    assert(real.getAs[Float]("nmi") >= -1e-6f && real.getAs[Float]("nmi") <= 1.0f)
  }

  test("q176: a click followed by purchase inside vs outside the window") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-aband").toString
    def ns(day: Int, hour: Int) = java.sql.Timestamp
      .valueOf(f"2024-01-$day%02d $hour%02d:00:00").getTime * 1000000L
    Seq(
      (1L, ns(1, 10), "click", 1.0, 1L),
      (1L, ns(1, 12), "purchase", 1.0, 2L),  // 2h later: converted
      (2L, ns(1, 10), "click", 1.0, 3L),
      (2L, ns(3, 10), "purchase", 1.0, 4L))  // 48h later: abandoned
      .toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Behavior.q176Abandonment(spark, tmp).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_clicks") == 2L)
    assert(r.head.getAs[Long]("n_converted") == 1L)
    assert(r.head.getAs[Long]("n_abandoned") == 1L)
    assert(r.head.getAs[Double]("abandon_rate") == 0.5)
  }

  test("q177: seasonality indices average to 1 weighted by day counts") {
    val rows = Behavior.q177Seasonality(spark, dir).collect()
    assert(rows.length <= 7)
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      assert(r.getAs[Double]("seasonality_idx") > 0.0)
    }
    // sum over dows of n_events equals total; weighted idx identity
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val days = rows.map(_.getAs[Long]("n_days_dow")).sum
    val weighted = rows.map(r => r.getAs[Double]("seasonality_idx") *
      r.getAs[Long]("n_days_dow")).sum / days
    assert(math.abs(weighted - 1.0) < 0.2,
      s"day-weighted mean index should be near 1, got $weighted")
    assert(total > 0)
  }

  test("q178: coverage is monotone in K and bounded by 1") {
    val rows = LangModel.q178VocabCoverage(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(10, 100, 1000))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    cov.foreach(c => assert(c > 0.0 && c <= 1.0))
    // K >= vocab covers everything
    val r = rows.last
    if (r.getAs[Long]("vocab_size") <= 1000)
      assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("q179: recovers exact coefficients from noiseless synthetic data") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ols").toString
    // y = 2 + 3*x1 - 1*x2 exactly, via event counts per user
    def ns(i: Int) = java.sql.Timestamp
      .valueOf(f"2024-01-01 00:${i % 60}%02d:00").getTime * 1000000L +
      i.toLong * 1000L
    val rows2 = (1 to 8).flatMap { u =>
      val x1 = u % 4; val x2 = u % 3
      val y = 12 + 3 * x1 - x2
      (Seq.fill(x1)("click") ++ Seq.fill(x2)("view") ++
        Seq.fill(y)("purchase")).zipWithIndex.map { case (t, i) =>
        (u.toLong, ns(u * 100 + i), t, 1.0, (u * 1000 + i).toLong)
      }
    }
    rows2.toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Stats.q179OlsMulti(spark, tmp).collect().head
    assert(math.abs(r.getAs[Double]("b0") - 12.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") + 1.0) < 1e-9)
  }

  test("q180: bucket counts cover every order and lateness is nonnegative") {
    val rows = Timeseries.q180Lateness(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    val orders = graft.sources.Tables.load(spark, dir, "orders").count()
    assert(total == orders)
    rows.foreach(r => assert(r.getAs[Long]("max_late_days") >= 0L))
    // random order dates vs sequential keys: disorder must exist
    assert(rows.exists(r => r.getAs[String]("bucket") != "a_on_time"))
  }

  test("q181: flags the engineered retry pair and respects the window") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dc").toString
    def ns(day: Int, hour: Int) = java.sql.Timestamp
      .valueOf(f"2024-01-$day%02d $hour%02d:00:00").getTime * 1000000L
    Seq(
      (1L, ns(1, 10), "purchase", 25.10, 1L),
      (1L, ns(1, 11), "purchase", 25.40, 2L),  // same dollar 25, 1h apart
      (1L, ns(5, 10), "purchase", 25.99, 3L),  // same dollar, outside 24h of 1&2
      (2L, ns(1, 10), "purchase", 25.10, 4L))  // other user: no pair
      .toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Validation.q181DoubleCharge(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("first_event") == 1L)
    assert(out.head.getAs[Long]("second_event") == 2L)
    assert(out.head.getAs[Long]("gap_us") == 3600000000L)
  }

  test("q182: the first document is fully novel; novelty is a valid fraction") {
    val rows = TextOps.q182Novelty(spark, dir).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0,
      "the earliest doc can only contain first-seen shingles")
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("q183: activation counts are consistent and lags nonnegative") {
    val r = Behavior.q183Activation(spark, dir).collect().head
    val (n, a) = (r.getAs[Long]("n_signed_up"), r.getAs[Long]("n_activated"))
    assert(a <= n && n > 0)
    assert(r.getAs[Double]("activation_rate") == a.toDouble / n)
    if (a > 0) {
      assert(r.getAs[Double]("median_lag_us") >= 0.0)
      assert(r.getAs[Double]("p90_lag_us") >= r.getAs[Double]("median_lag_us"))
    }
  }

  test("q184: rank climbs are consistent with the per-period counts") {
    val rows = Ranking.q184Trending(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_climb") ==
        r.getAs[Long]("rank_2000") - r.getAs[Long]("rank_2001"))
      assert(r.getAs[Long]("n_2000") > 0 && r.getAs[Long]("n_2001") > 0)
    }
    val climbs = rows.map(_.getAs[Long]("rank_climb"))
    assert(climbs.zip(climbs.tail).forall { case (a, b) => a >= b },
      "output must be sorted by climb descending")
  }

  test("q185: shares sum to 1 within each region and across regions") {
    val rows = Relational.q185ShareOfParent(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("region")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Double]("share_of_region")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"region shares must sum to 1: $s")
    }
    val regionShares = rows.groupBy(_.getAs[String]("region"))
      .map(_._2.head.getAs[Double]("region_share_of_total")).sum
    assert(math.abs(regionShares - 1.0) < 1e-9)
  }

  test("q186: flagged users truly exceeded the hourly threshold") {
    val rows = Validation.q186Burst(spark, dir, threshold = 2L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("peak_hourly") >= 2L)
      assert(r.getAs[Long]("n_burst_hours") >= 1L)
      assert(r.getAs[java.sql.Timestamp]("first_burst_hour") != null)
    }
    // a looser threshold can only flag fewer (or equal) users
    val strict = Validation.q186Burst(spark, dir, threshold = 3L).collect()
    assert(strict.length <= rows.length)
  }

  test("q187: a constructed spike day is flagged; flat history is not") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-anom").toString
    def ns(day: Int, i: Int) = java.sql.Timestamp
      .valueOf(f"2024-01-$day%02d 10:00:${i % 60}%02d").getTime * 1000000L + i
    // 9 days at 5/day, one day at 50: that day must flag
    val rows = (1 to 10).flatMap { d =>
      val n = if (d == 7) 50 else 5
      (1 to n).map(i => (1L, ns(d, i), "click", 1.0, d.toLong * 1000 + i))
    }
    rows.toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Timeseries.q187DailyAnomaly(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getAs[java.sql.Date]("d").toString == "2024-01-07")
    assert(out.head.getAs[Double]("z") > 2.0)
  }

  test("q189: forward matches are at-or-after and are the user's earliest such event") {
    val rows = AsofJoin.q189AsofForward(spark, dir).collect()
    assert(rows.nonEmpty)
    val events = graft.sources.Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val orders = graft.sources.Tables.load(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.take(200).foreach { r =>
      val (ok, eid) = (r.getAs[Long]("o_orderkey"), r.getAs[Long]("next_event_id"))
      val (cust, odate) = orders(ok)
      val candidates = events.filter(e => e._1 == cust && e._3 >= odate)
      val best = candidates.minBy(e => (e._3, e._2))
      assert(best._2 == eid, s"order $ok expected event ${best._2}, got $eid")
    }
  }

  test("q190: the grid is dense 7x24 and counts cover every event") {
    val rows = Behavior.q190Heatmap(spark, dir).collect()
    assert(rows.length == 168)
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == graft.sources.Tables.load(spark, dir, "events").count())
  }

  test("q191: HHI lies in (1/n, 1] and a monopoly region scores 1") {
    val rows = Behavior.q191Hhi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getAs[Long]("n_customers"), r.getAs[Float]("hhi"))
      assert(hhi > 1.0f / n - 1e-6f && hhi <= 1.0f + 1e-6f)
    }
  }

  test("q192: cadence summary is internally consistent") {
    val r = Behavior.q192RepeatCadence(spark, dir).collect().head
    assert(r.getAs[Long]("n_repeat_purchases") >= r.getAs[Long]("n_repeat_buyers"))
    assert(r.getAs[Double]("median_gap_hours") > 0.0)
    assert(r.getAs[Double]("p90_gap_hours") >= r.getAs[Double]("median_gap_hours"))
  }

  test("q163: quintile sizes differ by at most one and scores span 1..5") {
    val out = Behavior.q163Rfm(spark, dir).collect()
    assert(out.nonEmpty)
    for (colName <- Seq("r_score", "f_score", "m_score")) {
      val scores = out.map(_.getAs[Int](colName))
      assert(scores.forall(v => v >= 1 && v <= 5))
      val sizes = scores.groupBy(identity).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1,
        s"$colName ntile buckets must be balanced: $sizes")
    }
    // the top spender is in the first monetary quintile
    val best = out.maxBy(_.getAs[Double]("monetary"))
    assert(best.getAs[Int]("m_score") == 1)
    // the most recent purchaser is in the first recency quintile
    val rec = out.minBy(_.getAs[Long]("recency_days"))
    assert(rec.getAs[Int]("r_score") == 1)
  }

  test("q240: temperature weights are a probability vector that flattens " +
    "the natural shares — head down-sampled, tail up-sampled") {
    val rows = TextOps.q240TempMixture(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Float]("p").toDouble)
    val wsW = rows.map(_.getAs[Float]("w").toDouble)
    assert(math.abs(ps.sum - 1.0) < 1e-5)
    assert(math.abs(wsW.sum - 1.0) < 1e-5)
    // the provable flattening laws for α < 1 (NOT the folk claim that
    // every w lands between p and uniform — false for mid-head items):
    //  (a) below-uniform shares are up-sampled: p < 1/n ⇒ w > p
    //      (Cauchy–Schwarz: Z ≤ √n so 1/Z ≥ √(1/n) > √p)
    //  (b) above-uniform shares stay above uniform: p > 1/n ⇒ w > 1/n
    //      (concavity: mean(√p) ≤ √(1/n) < √p)
    //  (c) the largest share is down-sampled: √(p_max·p_j) ≥ p_j termwise
    val uniform = 1.0 / rows.length
    rows.foreach { r =>
      val (p, w) = (r.getAs[Float]("p").toDouble, r.getAs[Float]("w").toDouble)
      val boost = r.getAs[Float]("boost").toDouble
      assert(math.abs(boost - w / p) < 1e-5)
      if (p < uniform - 1e-9) assert(w > p, s"tail must up-sample: p=$p w=$w")
      if (p > uniform + 1e-9) assert(w > uniform - 1e-9, s"head stays above uniform: p=$p w=$w")
    }
    val maxRow = rows.maxBy(_.getAs[Float]("p").toDouble)
    assert(maxRow.getAs[Float]("w").toDouble < maxRow.getAs[Float]("p").toDouble,
      "the largest share must be down-sampled")
    // sqrt is monotone: the share order and the weight order agree
    assert(rows.sortBy(_.getAs[Float]("p")).map(_.getAs[String]("lang")).toSeq ==
      rows.sortBy(_.getAs[Float]("w")).map(_.getAs[String]("lang")).toSeq)
  }

  test("q248: cells partition the corpus, label shares sum to 1, " +
    "accuracy is the diagonal mass") {
    val rows = TextOps.q248LangConfusion(spark, "/root/testdata/sf0.001").collect()
    val nDocs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    rows.groupBy(_.getAs[String]("lang_label")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Float]("share_of_label").toDouble).sum - 1.0) < 1e-5)
    }
    val diag = rows.filter(r =>
      r.getAs[String]("lang_label") == r.getAs[String]("detected"))
      .map(_.getAs[Long]("n")).sum
    val acc = rows.head.getAs[Float]("accuracy").toDouble
    assert(math.abs(acc - diag.toDouble / nDocs) < 1e-6)
  }

  test("q249: capacity bookkeeping holds; splits and sequences are " +
    "monotone in the budget (2B boundaries are a subset of B boundaries)") {
    val rows = TextOps.q249PackingLadder(spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getAs[Long]("budget"))
    assert(rows.map(_.getAs[Long]("budget")).toSeq == Seq(256L, 512L, 1024L))
    val used = rows.head.getAs[Long]("used_tokens")
    rows.foreach { r =>
      assert(r.getAs[Long]("used_tokens") == used) // budget-independent
      val cap = r.getAs[Long]("capacity")
      assert(cap >= used)
      assert(cap == r.getAs[Long]("n_sequences") * r.getAs[Long]("budget"))
      assert(math.abs(r.getAs[Float]("waste_frac") -
        (cap - used).toDouble / cap) < 1e-6)
    }
    // 512-boundaries ⊂ 256-boundaries (and 1024 ⊂ 512): a doc crossing
    // a coarser boundary necessarily crosses the finer one
    val splits = rows.map(_.getAs[Long]("n_split_docs"))
    assert(splits(0) >= splits(1) && splits(1) >= splits(2))
    val seqs = rows.map(_.getAs[Long]("n_sequences"))
    assert(seqs(0) >= seqs(1) && seqs(1) >= seqs(2))
  }
}

package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the time-series family (q121-q123) and the
  * deterministic samplers (q124/q125): hand-built timelines with known
  * answers, the sweep-line partition-count invariance that proves the
  * distributed prefix sum is really global, and the sampling laws
  * (weight monotonicity, exact stratum quotas, determinism).
  */
class TimeseriesSamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** events fixture: ts written as NANOS longs (Tables.load decodes
    * nanos-as-long — the q99 fixture convention).
    */
  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ts").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select($"event_id",
        (unix_timestamp(to_timestamp($"ts_s")) * 1000000000L).as("ts"),
        $"user_id", $"event_type",
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q121: island arithmetic on a hand-built activity timeline") {
    // user 1: days 1-3 consecutive, then day 6 alone -> streaks {3, 1}
    // user 2: one day                                 -> streaks {1}
    val tmp = writeEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-02 10:00:00", 1L, "click"),
      (3L, "2024-01-02 18:00:00", 1L, "view"), // same day, must not split
      (4L, "2024-01-03 10:00:00", 1L, "click"),
      (5L, "2024-01-06 10:00:00", 1L, "click"),
      (6L, "2024-01-01 10:00:00", 2L, "click")))
    val got = Timeseries.q121Streaks(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 2L, 3L), (2L, 1L, 1L)))
  }

  test("q122: peak concurrency pins the closed-interval tie rule") {
    // Sessions (30-min gap rule, all intra-session gaps <= 25 min):
    //   u1 09:30-10:20, u2 09:40-10:00, u3 10:00-10:20.
    // u3 starts the instant u2 ends. Closed intervals (+1 sorts before
    // -1 at a tie) -> all three overlap at 10:00, peak 3; a half-open
    // rule would cap the day at 2 — so the assertion pins the tie order.
    val tmp = writeEvents(Seq(
      (1L, "2024-02-01 09:30:00", 1L, "a"), (2L, "2024-02-01 09:55:00", 1L, "a"),
      (3L, "2024-02-01 10:20:00", 1L, "a"),
      (4L, "2024-02-01 09:40:00", 2L, "a"), (5L, "2024-02-01 10:00:00", 2L, "a"),
      (6L, "2024-02-01 10:00:00", 3L, "a"), (7L, "2024-02-01 10:20:00", 3L, "a")))
    val got = Timeseries.q122Sweepline(spark, tmp).collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L)
  }

  test("q122: result is invariant to the range-partition count") {
    val base = Timeseries.q122Sweepline(spark, dir, parts = 1).collect().toSeq
    for (p <- Seq(3, 32)) {
      val got = Timeseries.q122Sweepline(spark, dir, parts = p).collect().toSeq
      assert(got == base, s"parts=$p diverged from parts=1")
    }
  }

  test("q123: fold matches the direct recurrence computed on the driver") {
    import spark.implicits._
    val got = Timeseries.q123Ewma(spark, dir)
      .select($"event_type", $"n", $"ewma")
      .collect().groupBy(_.getString(0))
    for ((_, rows) <- got) {
      var s = Double.NaN
      rows.foreach { r =>
        val x = r.getLong(1).toDouble
        s = if (s.isNaN) x else 0.3 * x + 0.7 * s
        assert(r.getDouble(2) == s) // identical op order -> bit-equal
      }
    }
    assert(got.nonEmpty)
  }

  test("q124: sample is deterministic and favors heavier docs") {
    val a = Sampling.q124WeightedSample(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = Sampling.q124WeightedSample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b && a.length == 200 && a.distinct.length == 200)
    // E-S law: expected inclusion scales with weight. Proxy assertion:
    // the sampled docs' mean n_chars exceeds the corpus mean.
    import spark.implicits._
    val corpusMean = graft.sources.Tables.load(spark, dir, "documents")
      .agg(avg($"n_chars")).head.getDouble(0)
    val sampleMean = Sampling.q124WeightedSample(spark, dir)
      .agg(avg($"n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("q125: exact quota per stratum, disjoint and deterministic") {
    import spark.implicits._
    val got = Sampling.q125StratifiedSample(spark, dir)
    val quota = got.groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quota.keySet == avail.keySet)
    for ((src, n) <- quota) assert(n == math.min(50L, avail(src)))
    val ids = got.select($"doc_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
  }

  test("q139: conversion rate and exact percentile latencies on a hand timeline") {
    // u1 converts 10s after first view, u3 converts 20s after, u2 never
    // -> rate 2/3, latencies {10e6, 20e6} µs: p50 = 15e6, p90 = 19e6
    val tmp = writeEvents(Seq(
      (1L, "2024-05-01 10:00:00", 1L, "view"),
      (2L, "2024-05-01 10:00:10", 1L, "purchase"),
      (3L, "2024-05-01 10:00:00", 2L, "view"),
      (4L, "2024-05-01 10:00:00", 3L, "view"),
      (5L, "2024-05-01 10:00:20", 3L, "purchase"),
      (6L, "2024-05-01 09:00:00", 4L, "purchase"))) // purchase before any view: not counted
    val r = Funnel.q139FunnelLatency(spark, tmp).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 2.0 / 3.0) < 1e-15)
    assert(r.getDouble(3) == 15e6 && r.getDouble(4) == 19e6)
  }

  test("q136: selection is budget-maximal and invariant to the partition count") {
    import spark.implicits._
    val budget = 1000L // binding on the sf0.001 corpus (~2.5k tokens)
    val base = Sampling.q136TokenBudget(spark, dir, budget, parts = 1).collect()
    for (p <- Seq(3, 32)) {
      val got = Sampling.q136TokenBudget(spark, dir, budget, parts = p).collect()
      assert(got.toSeq.map(_.toSeq) == base.toSeq.map(_.toSeq),
        s"parts=$p diverged from parts=1")
    }
    // the admitted prefix respects the budget...
    assert(base.nonEmpty && base.forall(_.getLong(3) <= budget))
    // ...and is maximal: the corpus exceeds the budget, so the cut must
    // land within one (corpus-max) doc of the line — any bigger gap
    // means the next ranked doc was droppable without overflow
    val stats = graft.sources.Tables.load(spark, dir, "documents")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(sum($"n").as("total"), max($"n").as("biggest")).head
    assert(stats.getLong(0) > budget, "fixture corpus must exceed the budget")
    val lastCum = base.map(_.getLong(3)).max
    assert(lastCum + stats.getLong(1) > budget,
      s"cut at $lastCum leaves more than one doc (${stats.getLong(1)}) of headroom")
  }

  test("q130: gap days are zero-filled, flagged, and carry the last observation") {
    // user 1: 2 events on day 1, none on day 2, 1 on day 3
    // -> day 2 materializes with n_events=0, filled=true, carried=2
    val tmp = writeEvents(Seq(
      (1L, "2024-03-01 10:00:00", 1L, "a"), (2L, "2024-03-01 11:00:00", 1L, "a"),
      (3L, "2024-03-03 10:00:00", 1L, "a"),
      (4L, "2024-03-05 10:00:00", 2L, "a")))
    val got = Timeseries.q130GapFill(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toList
    assert(got == List(
      (1L, "2024-03-01", 2L, false, 2L),
      (1L, "2024-03-02", 0L, true, 2L),
      (1L, "2024-03-03", 1L, false, 1L),
      (2L, "2024-03-05", 1L, false, 1L)))
  }

  test("q131: transition counts and row-normalized probabilities") {
    // user 1: a -> b -> a ; user 2: a -> c
    // transitions: (a,b)=1 (a,c)=1 (b,a)=1 -> p(a,b)=p(a,c)=0.5, p(b,a)=1
    val tmp = writeEvents(Seq(
      (1L, "2024-04-01 10:00:00", 1L, "a"),
      (2L, "2024-04-01 10:01:00", 1L, "b"),
      (3L, "2024-04-01 10:02:00", 1L, "a"),
      (4L, "2024-04-01 10:00:00", 2L, "a"),
      (5L, "2024-04-01 10:01:00", 2L, "c")))
    val got = Behavior.q131Markov(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getFloat(3))).toList
    assert(got == List(
      ("a", "b", 1L, 0.5f), ("a", "c", 1L, 0.5f), ("b", "a", 1L, 1.0f)))
  }

  test("q132: MAD flags the planted spike and nothing else") {
    import spark.implicits._
    // values 1..9 plus a 100 spike: median 5.5, MAD of the abs
    // deviations {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5} = 2.5,
    // threshold 7.5 -> exactly one outlier (the spike)
    val tmp = Files.createTempDirectory("graft-mad").toString
    (1 to 10).map(i => (i.toLong, if (i == 10) 100.0 else i.toDouble))
      .toDF("event_id", "value")
      .select($"event_id", lit(1704103200000000000L).as("ts"),
        lit(1L).as("user_id"), lit("a").as("event_type"),
        $"value", lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Timeseries.q132MadAnomaly(spark, tmp).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 5.5 && r.getDouble(4) == 2.5)
  }

  test("q157: an exactly linear daily series recovers slope and intercept") {
    import java.sql.Timestamp
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-trend").toString
    // day d (0..4) carries exactly 3 + 2d events: perfect fit y = 3 + 2x
    val rows = for (d <- 0 to 4; i <- 1 to (3 + 2 * d)) yield
      (Timestamp.valueOf(f"2024-01-0${d + 1} 08:00:00"), "click")
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Timeseries.q157Trend(spark, tmp).collect().head
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 3.0)
  }

  test("q198: bucketed interval join equals the direct theta join, each pair once") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Timeseries.q198IntervalJoin(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("total_overlap_us")))).toMap
    // reference: sessionize identically, then the plain quadratic overlap
    // join on the collected intervals
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val iv = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
      .withColumn("prev", lag($"ts_us", 1).over(byUser))
      .withColumn("ns", when($"prev".isNull || $"ts_us" - $"prev" > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum($"ns").over(byUser.rowsBetween(Long.MinValue, 0)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("st"), max($"ts_us").as("en"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("st"), r.getAs[Long]("en")))
    val expect = (for {
      a <- iv; b <- iv
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield ((a._1, b._1), math.min(a._3, b._3) - math.max(a._2, b._2)))
      .groupBy(_._1).map { case (k, vs) => k -> (vs.length.toLong, vs.map(_._2).sum) }
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q204: consistent-hash growth moves keys ONLY to the new shard, ~1/9 of them") {
    val dir = "/root/testdata/sf0.001"
    val m = Sampling.q204Reshard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val total = m.values.sum
    assert(total == graft.sources.Tables.load(spark, dir, "documents").count())
    // the consistent-hashing contract: a key either stays put or moves
    // to the NEW shard (8) — never between two old shards
    m.keys.foreach { case (from, to) =>
      assert(from == to || to == 8L, s"illegal move $from -> $to")
      assert(from >= 0 && from <= 7 && to >= 0 && to <= 8)
    }
    val moved = m.collect { case ((f, t), n) if f != t => n }.sum
    val frac = moved.toDouble / total
    // expectation 1/9 ≈ 0.111; wide band for the small corpus
    assert(frac > 0.02 && frac < 0.30, s"moved fraction $frac")
  }

  test("q211: trailing bands match a driver recompute of the 7-day window") {
    val dir = "/root/testdata/sf0.001"
    val got = Timeseries.q211Bollinger(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r).toMap
    assert(got.nonEmpty)
    // recompute from the RAW daily series (the query filters out each
    // type's first day, which has no trailing window)
    val daily = graft.sources.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2))
    daily.foreach { case (et, series) =>
      val ns = series.map(_._3)
      series.zipWithIndex.foreach { case ((_, day, n), i) =>
        val trail = ns.slice(math.max(0, i - 7), i)
        if (trail.isEmpty) assert(!got.contains((et, day)))
        else {
          val r = got((et, day))
          val nw = trail.length
          assert(r.getAs[Long]("nw") == nw)
          val mean = trail.sum.toDouble / nw
          val sd = math.sqrt(trail.map(x => x.toDouble * x).sum / nw -
            (trail.sum.toDouble / nw) * (trail.sum.toDouble / nw))
          assert(r.getAs[Double]("trail_mean") == mean)
          assert(math.abs(r.getAs[Double]("upper") - (mean + 2 * sd)) < 1e-9)
          assert(r.getAs[Boolean]("above") == (n > mean + 2 * sd))
        }
      }
    }
  }

  test("q213: percentile bands are ordered and match a driver recompute for one group") {
    val dir = "/root/testdata/sf0.001"
    val rows = Timeseries.q213DailyPctl(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90")))
    val r0 = rows.head
    val vs = graft.sources.Tables.load(spark, dir, "events")
      .filter(col("event_type") === r0.getString(0) &&
        to_date(col("ts")) === r0.getDate(1))
      .select("value").collect().map(_.getDouble(0)).sorted
    assert(r0.getAs[Long]("n") == vs.length)
    def pctl(p: Double): Double = {
      val pos = p * (vs.length - 1)
      val lo = pos.toInt
      if (lo == vs.length - 1) vs(lo)
      else vs(lo) + (pos - lo) * (vs(lo + 1) - vs(lo))
    }
    assert(math.abs(r0.getAs[Double]("p50") - pctl(0.5)) < 1e-9)
    assert(math.abs(r0.getAs[Double]("p90") - pctl(0.9)) < 1e-9)
  }

  test("q206: flag law is exact — flagged iff the day exceeds 1.5x its weekday mean") {
    val dir = "/root/testdata/sf0.001"
    val rows = Timeseries.q206SeasonalSpike(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val wm = r.getAs[Double]("weekday_mean")
      val ratio = r.getAs[Double]("ratio")
      val flagged = r.getAs[Boolean]("flagged")
      assert(wm > 0 && math.abs(ratio - n / wm) < 1e-12)
      // the query's gate is the exact integer cross-multiplication; the
      // double reconstruction agrees except possibly AT the boundary
      if (math.abs(n - 1.5 * wm) > 1e-9) assert(flagged == (n > 1.5 * wm))
      else assert(!flagged) // exact equality is not an exceedance
    }
  }

  test("q201: Holt fold matches the direct recurrence computed on the driver") {
    val dir = "/root/testdata/sf0.001"
    val rows = Timeseries.q201Holt(spark, dir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getDate(1).toString))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      var l = rs.head.getAs[Long]("n").toDouble
      var b = 0.0
      assert(rs.head.getAs[Double]("level") == l && rs.head.getAs[Double]("trend") == 0.0)
      rs.tail.foreach { r =>
        val x = r.getAs[Long]("n").toDouble
        val ln = 0.5 * x + 0.5 * (l + b)
        val bn = 0.3 * (ln - l) + 0.7 * b
        l = ln; b = bn
        assert(r.getAs[Double]("level") == l && r.getAs[Double]("trend") == b)
        assert(r.getAs[Double]("forecast_next") == l + b)
      }
    }
  }

  test("q199: clamped balance matches a direct per-user fold and respects bounds") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Timeseries.q199ClampedBalance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(b => b >= 0L && b <= 20000L))
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        when($"event_type" === "purchase", round($"value" * 100).cast("long"))
          .otherwise(-100L).as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      var bal = 0L
      rows.sortBy(r => (r._3, r._2)).toSeq.map { r =>
        bal = math.min(math.max(bal + r._4, 0L), 20000L)
        (u, r._2) -> bal
      }
    }.toMap
    assert(got == expect)
  }
}

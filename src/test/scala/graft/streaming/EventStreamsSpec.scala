package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Event-time streaming semantics: watermarked windows, session windows,
  * stateful dedup, custom state. Driven through MemoryStream so event
  * order and watermark advancement are controlled exactly.
  */
// file-level so Spark's codegen'd encoder applies (an inner case class
// makes Janino fall back to interpreted encoding with noisy stacks)
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

case class Doc(doc_id: Long, text: String)

case class SplitDoc(doc_id: Long, text: String, split: String)

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def runToCompletion(df: DataFrame, mode: OutputMode): Seq[org.apache.spark.sql.Row] = {
    val name = s"mem_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
    spark.sql(s"SELECT * FROM $name").collect().toSeq
  }

  import spark.implicits._

  test("windowed counts bucket by event-time hour and aggregate") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(5), 1, "click", 1.0), Ev(2, ts(20), 1, "click", 2.0),
      Ev(3, ts(40), 2, "view", 3.0))
    val rows = runToCompletion(
      EventStreams.windowedCounts(in.toDF(), width = "1 hour"), OutputMode.Update())
    val byType = rows.map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    assert(byType("click") == (2L, 3.0))
    assert(byType("view") == (1L, 3.0))
    assert(rows.forall(_.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00")))
  }

  test("session windows split on gap > 30 min (append emits on watermark passage)") {
    val in = MemoryStream[Ev](spark)
    val name = s"sess_${System.nanoTime()}"
    val q = EventStreams.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    // user 1: events at 10:00, 10:10 (one session), then 11:00 (new session)
    in.addData(
      Ev(1, ts(0), 1, "a", 0), Ev(2, ts(10), 1, "a", 0),
      Ev(3, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "a", 0))
    q.processAllAvailable()
    // flush event advances the watermark past 11:30 (session 2 end) + 10 min
    in.addData(Ev(99, Timestamp.valueOf("2024-01-01 11:50:00"), 99, "a", 0))
    q.processAllAvailable(); q.stop()
    val sessions = spark.sql(s"SELECT * FROM $name").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("stateful dedup drops duplicate event_ids within the watermark") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(0), 1, "a", 0), Ev(1, ts(1), 1, "a", 0), // dup id
      Ev(2, ts(2), 1, "a", 0))
    val rows = runToCompletion(EventStreams.dedupByKey(in.toDF()), OutputMode.Append())
    assert(rows.map(_.getAs[Long]("event_id")).sorted == Seq(1L, 2L))
  }

  test("stream-stream join matches same-user events within the time bound") {
    val l = MemoryStream[Ev](spark)
    val r = MemoryStream[Ev](spark)
    l.addData(Ev(1, ts(0), 7, "a", 0))
    r.addData(
      Ev(100, ts(5), 7, "b", 0),   // within 15 min -> match
      Ev(101, ts(40), 7, "b", 0),  // outside window -> no match
      Ev(102, ts(5), 8, "b", 0))   // other user -> no match
    val rows = runToCompletion(
      EventStreams.streamStreamJoin(l.toDF(), r.toDF()), OutputMode.Append())
    assert(rows.map(x => (x.getAs[Long]("l_id"), x.getAs[Long]("r_id"))).toSet == Set((1L, 100L)))
  }

  test("stream-static join enriches events with the dimension, unmatched keys survive") {
    import spark.implicits._
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Ev](spark)
    in.addData(Ev(1, ts(0), 7, "a", 0), Ev(2, ts(1), 9, "b", 0))
    val rows = runToCompletion(
      EventStreams.streamStaticJoin(in.toDF(), dim), OutputMode.Append())
    val tiers = rows.map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
    assert(tiers == Map(1L -> Some("gold"), 2L -> None))
  }

  test("left-outer stream-stream join emits unmatched lefts after the watermark closes") {
    val l = MemoryStream[Ev](spark)
    val r = MemoryStream[Ev](spark)
    val name = s"ssoj_${System.nanoTime()}"
    val q = EventStreams.streamStreamLeftJoin(l.toDF(), r.toDF())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    l.addData(
      Ev(1, ts(0), 7, "a", 0),  // will match
      Ev(2, ts(0), 9, "a", 0))  // no partner → must surface with null r_id
    r.addData(Ev(100, ts(5), 7, "b", 0))
    q.processAllAvailable()
    // advance the watermark far past l's window so the unmatched row emits
    l.addData(Ev(50, Timestamp.valueOf("2024-01-01 12:00:00"), 99, "a", 0))
    r.addData(Ev(51, Timestamp.valueOf("2024-01-01 12:00:00"), 98, "b", 0))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(s"SELECT * FROM $name").collect()
    val byLeft = rows.map(x =>
      x.getAs[Long]("l_id") -> Option(x.getAs[java.lang.Long]("r_id"))).toMap
    assert(byLeft(1L) == Some(100L))
    assert(byLeft.get(2L) == Some(None), s"unmatched left not emitted: $byLeft")
  }

  test("streaming near-dup flags: cross-batch LSH state catches a late near-copy") {
    val base = "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew strong potions under a pale winter moon near the frozen river bank"
    val nearCopy = base.replace("winter", "summer") // ~1 word of 25 changed
    val distinct1 = "completely different text about database replication protocols " +
      "and the consistency guarantees of distributed commit logs at scale"
    val distinct2 = "yet another unrelated document discussing tokenizer vocabularies " +
      "byte pair encodings and the statistics of subword segmentation"

    val in = MemoryStream[(Long, String)](spark)
    val name = s"neardup_${System.nanoTime()}"
    val q = EventStreams.nearDupFlags(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    in.addData((1L, base), (2L, distinct1))
    q.processAllAvailable()
    in.addData((3L, nearCopy), (4L, distinct2)) // near-copy arrives a batch later
    q.processAllAvailable()
    in.addData((1L, base)) // at-least-once redelivery of the original
    q.processAllAvailable(); q.stop()

    val flags = spark.sql(s"SELECT * FROM $name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the near-copy is flagged against the original (possibly by several
    // bands — at-least-once per band is the contract); nothing else is —
    // in particular the redelivered original is NOT its own duplicate
    assert(flags.nonEmpty)
    assert(flags.forall { case (d, of, est) => d == 3L && of == 1L && est >= 0.5 })
  }

  test("flatMapGroupsWithState assigns per-user sequence numbers across batches") {
    val in = MemoryStream[Ev](spark)
    val seqName = s"seqs_${System.nanoTime()}"
    val q = EventStreams.sequenceNumbers(in.toDF())
      .writeStream.format("memory").queryName(seqName).outputMode("append").start()
    in.addData(Ev(10, ts(0), 1, "a", 0), Ev(11, ts(1), 1, "a", 0), Ev(20, ts(0), 2, "a", 0))
    q.processAllAvailable()
    in.addData(Ev(12, ts(2), 1, "a", 0)) // state carries: next seq for user 1 is 3
    q.processAllAvailable(); q.stop()
    val got = spark.sql(s"SELECT * FROM $seqName").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 10L)) == 1L && got((1L, 11L)) == 2L && got((1L, 12L)) == 3L)
    assert(got((2L, 20L)) == 1L)
  }

  test("transformWithState keeps multiple state variables per user across batches") {
    // the v2 arbitrary-state operator requires the RocksDB provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      val name = s"act_${System.nanoTime()}"
      val q = EventStreams.userActivity(in.toDF(), keepLast = 2)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      in.addData(Ev(10, ts(0), 1, "a", 1.0), Ev(11, ts(1), 1, "a", 2.0))
      q.processAllAvailable()
      in.addData(Ev(12, ts(2), 1, "a", 3.0)) // both state vars must carry over
      q.processAllAvailable(); q.stop()
      val rows = spark.sql(s"SELECT * FROM $name WHERE user_id = 1 ORDER BY n_events").collect()
      assert(rows.length == 2)
      // batch 1: count 2, sum 3.0, recent capped to last 2 of [10, 11]
      assert(rows(0).getLong(1) == 2L && rows(0).getDouble(2) == 3.0)
      assert(rows(0).getSeq[Long](3) == Seq(10L, 11L))
      // batch 2: ValueState carried (count 3, sum 6.0); ListState capped to [11, 12]
      assert(rows(1).getLong(1) == 3L && rows(1).getDouble(2) == 6.0)
      assert(rows(1).getSeq[Long](3) == Seq(11L, 12L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("control band: calm buckets pass, the spike bucket flags above the band") {
    val in = MemoryStream[Ev](spark)
    val name = s"cb_${System.nanoTime()}"
    val q = EventStreams.controlBand(in.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // hourly buckets 10:00..19:00 carry one event each; 20:00 carries five
    val calm = (0 until 10).map(i =>
      Ev(i.toLong, Timestamp.valueOf(f"2024-01-01 ${10 + i}%02d:00:00"), 1, "view", 0.0))
    val spike = (0 until 5).map(i =>
      Ev(100L + i, Timestamp.valueOf(f"2024-01-01 20:0$i:00"), 1, "view", 0.0))
    val flush = Ev(200L, Timestamp.valueOf("2024-01-01 21:00:00"), 1, "view", 0.0)
    in.addData(calm: _*)
    q.processAllAvailable()
    in.addData(spike: _*)
    q.processAllAvailable()
    in.addData(flush) // closes the spike bucket
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(s"SELECT * FROM $name ORDER BY bucket_start_us").collect()
    // bucket 10:00 closed with an empty trail (no emission); 11:00..20:00 emit
    assert(rows.length == 10)
    val spikeRow = rows.last
    assert(spikeRow.getAs[Long]("n") == 5L && spikeRow.getAs[Long]("nw") == 7L)
    assert(spikeRow.getAs[Double]("trail_mean") == 1.0)
    assert(spikeRow.getAs[Boolean]("above") && !spikeRow.getAs[Boolean]("below"))
    rows.init.foreach { r =>
      assert(!r.getAs[Boolean]("above") && !r.getAs[Boolean]("below"))
      assert(r.getAs[Long]("n") == 1L)
    }
  }

  test("clamped balance: streaming ledger state carries and clamps across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      val name = s"bal_${System.nanoTime()}"
      val q = EventStreams.clampedBalance(in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      // user 1: deposit 5.00 then draw; user 2: draw first (floor clamps at 0)
      in.addData(Ev(10, ts(0), 1, "purchase", 5.0), Ev(11, ts(1), 1, "click", 0.0),
        Ev(20, ts(0), 2, "click", 0.0))
      q.processAllAvailable()
      // batch 2: state carried; a huge deposit hits the 20000-cent cap
      in.addData(Ev(12, ts(2), 1, "purchase", 300.0))
      q.processAllAvailable(); q.stop()
      val got = spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got((1L, 10L)) == 500L)
      assert(got((1L, 11L)) == 400L)
      assert(got((2L, 20L)) == 0L)   // floor clamp
      assert(got((1L, 12L)) == 20000L) // cap clamp, state carried across batches
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("psi drift: a matching window scores low, a shifted window trips the line") {
    // uniform reference over [0, 10) in 10 bins
    val ref = Seq.fill(10)(0.1)
    val in = MemoryStream[Ev](spark)
    // hour 10: one event per bin — matches the reference
    val calm = (0 until 10).map(i =>
      Ev(i.toLong, ts(i), 1, "view", i + 0.5))
    // hour 11: all mass in the top bin — clear drift (outlier 99.0
    // must CLAMP into the last bin, not error or vanish)
    val hot = (0 until 10).map(i =>
      Ev(100L + i, Timestamp.valueOf(f"2024-01-01 11:$i%02d:00"), 1, "view",
        if (i == 0) 99.0 else 9.5))
    in.addData(calm ++ hot: _*)
    val rows = runToCompletion(
      EventStreams.psiDrift(in.toDF(), ref, lo = 0.0, hi = 10.0),
      OutputMode.Update())
    val byStart = rows.map(r =>
      r.getAs[Timestamp]("window_start") -> r).toMap
    val calmRow = byStart(Timestamp.valueOf("2024-01-01 10:00:00"))
    val hotRow = byStart(Timestamp.valueOf("2024-01-01 11:00:00"))
    assert(calmRow.getAs[Long]("n") == 10L && hotRow.getAs[Long]("n") == 10L)
    assert(calmRow.getAs[Double]("psi") < 0.1 && !calmRow.getAs[Boolean]("drifted"))
    assert(hotRow.getAs[Double]("psi") > 0.2 && hotRow.getAs[Boolean]("drifted"))
  }

  test("psi drift: reference proportions derive from a batch frame") {
    import spark.implicits._
    val refDf = (0 until 100).map(i => i % 10 + 0.5).toDF("value")
    val props = EventStreams.referenceProportions(refDf, "value", 0.0, 10.0)
    assert(props == Seq.fill(10)(0.1))
    assert(math.abs(props.sum - 1.0) < 1e-12)
  }

  test("ohlc bars: open/close follow event time, not arrival order") {
    val in = MemoryStream[Ev](spark)
    // arrival order deliberately scrambled vs event time
    in.addData(
      Ev(3, ts(40), 1, "click", 30.0),  // chronologically last -> close
      Ev(1, ts(5), 1, "click", 10.0),   // chronologically first -> open
      Ev(2, ts(20), 1, "click", 99.0))  // the high
    val rows = runToCompletion(
      EventStreams.ohlcBars(in.toDF(), width = "1 hour"), OutputMode.Update())
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Double]("open") == 10.0)
    assert(r.getAs[Double]("high") == 99.0)
    assert(r.getAs[Double]("low") == 10.0)
    assert(r.getAs[Double]("close") == 30.0)
    assert(r.getAs[Long]("n_events") == 3L)
  }

  test("burst flags: only the window where the user crossed the threshold emits") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(1), 7, "a", 0), Ev(2, ts(2), 7, "a", 0),
      Ev(3, ts(3), 7, "a", 0),                           // user 7: 3 in hour
      Ev(4, ts(10), 8, "a", 0))                          // user 8: only 1
    val rows = runToCompletion(
      EventStreams.burstFlags(in.toDF(), width = "1 hour", threshold = 3L),
      OutputMode.Update())
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("user_id") == 7L)
    assert(rows.head.getAs[Long]("n_events") == 3L)
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming dedup: batch-partitioned replay of the corpus equals the one-shot dedup (batch ≡ stream)") {
    withRocksDb {
      import org.apache.spark.sql.functions.{col, max, md5, min, count => cnt, lit}
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[Doc].collect().toSeq
      // arrival: the corpus, then a re-crawl of the even half, then a
      // full re-crawl — doc_id strictly increasing across batches, so
      // the one-shot min-doc_id dedup is the stream's ground truth
      val b1 = docs
      val b2 = docs.filter(_.doc_id % 2 == 0).map(d => Doc(d.doc_id + 1000000L, d.text))
      val b3 = docs.map(d => Doc(d.doc_id + 2000000L, d.text))
      val union = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
      val truth = union.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("owner"), cnt(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      val in = MemoryStream[Doc](spark)
      val name = s"sdedup_${System.nanoTime()}"
      val q = EventStreams.streamingDedup(in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      Seq(b1, b2, b3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()

      val out = spark.sql(s"SELECT * FROM $name")
      val survivors = out.filter(col("is_new"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(survivors == truth.map { case (fp, (own, _)) => fp -> own })
      val finalCounts = out.groupBy(col("fp")).agg(max(col("n_copies")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(finalCounts == truth.map { case (fp, (_, n)) => fp -> n })
    }
  }

  test("streaming dedup: state survives a kill/restart — a re-crawled text is not re-emitted as survivor") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.col
      val in = MemoryStream[Doc](spark)
      val ckpt = Files.createTempDirectory("graft-sdedup-ckpt").toString
      val out = Files.createTempDirectory("graft-sdedup-out").toString
      def start() = EventStreams.streamingDedup(in.toDF())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      in.addData(Doc(1, "alpha"), Doc(2, "beta"))
      q1.processAllAvailable(); q1.stop()
      val q2 = start() // state + sink log restored from the checkpoint
      in.addData(Doc(3, "alpha"), Doc(4, "gamma"))
      q2.processAllAvailable(); q2.stop()

      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      val byFp = rows.groupBy(_._1)
      // exactly one survivor emission per distinct text, none duplicated
      assert(rows.count(_._4) == 3)
      // alpha: owner 1 carried across the restart, count 2, second
      // emission NOT flagged new
      val alpha = byFp.values.find(_.exists(r => r._2 == 1L)).get.sortBy(_._3)
      assert(alpha.map(r => (r._2, r._3, r._4)).toSeq ==
        Seq((1L, 1L, true), (1L, 2L, false)))
    }
  }

  test("streaming segment dedup: doc_id-ordered replay equals q286's one-shot " +
    "cleaned corpus (batch ≡ stream)") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[Doc]
        .collect().toSeq.sortBy(_.doc_id)
      val want = graft.queries.Dedup.q286SegmentDedup(spark, "/root/testdata/sf0.001")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap

      val in = MemoryStream[Doc](spark)
      val out = Files.createTempDirectory("graft-segdedup-out").toString
      val ckpt = Files.createTempDirectory("graft-segdedup-ckpt").toString
      val q = EventStreams.streamSegmentDedupToParquet(in.toDF(), out, ckpt)
      // five batches in doc_id order — the arrival order under which
      // the stream's first-occurrence keeper IS q286's global
      // (doc_id, seg_no)-min keeper
      docs.grouped(math.max(1, docs.size / 5)).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
      q.stop()

      val got = spark.read.parquet(out).collect().map(r =>
        r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_segments"),
          r.getAs[Long]("n_kept"), r.getAs[String]("clean_text"))).toMap
      assert(got.size == want.size)
      assert(got == want)
    }
  }

  test("streaming segment dedup: the segment index survives a kill/restart — " +
    "a re-crawled boilerplate segment is still dropped") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.col
      val in = MemoryStream[Doc](spark)
      val out = Files.createTempDirectory("graft-segdd2-out").toString
      val ckpt = Files.createTempDirectory("graft-segdd2-ckpt").toString
      val w = 2
      def start() = EventStreams.streamSegmentDedupToParquet(in.toDF(), out, ckpt, w)
      val q1 = start()
      in.addData(Doc(1, "the header menu body one two"))
      q1.processAllAvailable(); q1.stop()
      val q2 = start() // index restored from the checkpoint
      in.addData(Doc(2, "the header menu body three four"))
      q2.processAllAvailable(); q2.stop()

      val got = spark.read.parquet(out).collect().map(r =>
        r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
      // doc 1 keeps all 3 segments; doc 2's first two ("the header",
      // "menu body") were indexed before the restart and stay dropped
      assert(got(1L) == (3L, "the header menu body one two"))
      assert(got(2L) == (1L, "three four"))
    }
  }

  test("streaming segment quality filter: replaying the corpus against the " +
    "frozen model equals q294's one-shot output (batch ≡ stream)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val want = graft.queries.LangModel.q294SegmentQualityFilter(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val model = graft.queries.LangModel.segQualityTrain(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[Doc]
      .collect().toSeq.sortBy(_.doc_id)

    val in = MemoryStream[Doc](spark)
    val out = Files.createTempDirectory("graft-segq-out").toString
    val ckpt = Files.createTempDirectory("graft-segq-ckpt").toString
    val q = EventStreams.streamSegmentQualityToParquet(in.toDF(), model, out, ckpt)
    docs.grouped(math.max(1, docs.size / 5)).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    val got = spark.read.parquet(out).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_segments"),
        r.getAs[Long]("n_scored"), r.getAs[Long]("n_kept"),
        r.getAs[String]("clean_text"))).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("streaming segment quality filter: kill/restart loses and duplicates " +
    "nothing, and an UNSEEN word takes the add-one floor instead of vanishing") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val model = graft.queries.LangModel.segQualityTrain(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[Doc]
      .collect().toSeq.sortBy(_.doc_id).take(40)
    val (b1, b2) = docs.splitAt(20)
    // a doc whose words the corpus has never seen: every bigram scores
    // the same add-one floor, the doc still flows through scored+kept
    // bookkeeping (never dropped by a join)
    val alien = Doc(999999L, Seq.fill(20)("zzzunseenzzz").mkString(" "))

    val in = MemoryStream[Doc](spark)
    val out = Files.createTempDirectory("graft-segq2-out").toString
    val ckpt = Files.createTempDirectory("graft-segq2-ckpt").toString
    def start() = EventStreams.streamSegmentQualityToParquet(in.toDF(), model, out, ckpt)
    val q1 = start()
    in.addData(b1: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    in.addData((b2 :+ alien): _*); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out).collect()
    val ids = got.map(_.getAs[Long]("doc_id"))
    assert(ids.length == ids.distinct.length, "restart duplicated a document")
    assert(ids.toSet == (docs.map(_.doc_id).toSet + alien.doc_id))
    val arow = got.find(_.getAs[Long]("doc_id") == alien.doc_id).get
    // 20 words -> a 16-word segment + a 4-word tail; both have bigrams,
    // so both are scored (against the add-one floor), none lost
    assert(arow.getAs[Long]("n_segments") == 2L)
    assert(arow.getAs[Long]("n_scored") == 2L)
  }

  test("streaming KN-4 perplexity filter: replaying the eval fold against the " +
    "loaded ARPA model equals q295's one-shot scores (batch ≡ stream)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val want = graft.queries.LangModel.q295Kn4ModelServe(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getFloat(4), r.getFloat(5))).toMap
    val model = graft.queries.LangModel.kn4Load(spark,
      graft.queries.LangModel.kn4Export(spark, sf))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[Doc]
      .collect().toSeq.filter(_.doc_id % 10 == 0).sortBy(_.doc_id)

    val in = MemoryStream[Doc](spark)
    val out = Files.createTempDirectory("graft-kn4s-out").toString
    val ckpt = Files.createTempDirectory("graft-kn4s-ckpt").toString
    // midpoint of the fold's score range: guarantees both verdicts
    val avgs = want.values.map(_._5)
    val thr = (avgs.min + avgs.max) / 2
    val q = EventStreams.streamKn4PerplexityToParquet(in.toDF(), model, thr, out, ckpt)
    docs.grouped(math.max(1, docs.size / 3)).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    val rows = spark.read.parquet(out).collect()
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_4grams"), r.getAs[Long]("n_stored"),
        r.getAs[Long]("n_backoff"), r.getAs[Float]("sum_logprob_kn4"),
        r.getAs[Float]("avg_logprob_kn4"))).toMap
    assert(got.size == want.size)
    assert(got == want)
    // the frozen threshold stamps both verdicts somewhere in the fold
    val keeps = rows.map(_.getAs[Boolean]("keep")).toSet
    assert(keeps == Set(true, false),
      s"threshold $thr should split the fold, got $keeps")
  }

  test("heavy hitters: full capacity ⇒ exact streaming word count (batch ≡ stream)") {
    withRocksDb {
      import org.apache.spark.sql.functions.{col, explode, split, count => cnt, lit, max}
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[Doc].collect().toSeq
      val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
      val truth = docs.toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(cnt(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      val in = MemoryStream[Doc](spark)
      val name = s"hh_${System.nanoTime()}"
      val q = EventStreams.heavyHitters(in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      Seq(b1, b2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()

      val out = spark.sql(s"SELECT * FROM $name")
      // no evictions at full capacity: counts only grow, last = max
      val got = out.groupBy(col("word")).agg(max(col("count_est")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == truth)
      assert(out.agg(max(col("overcount_max"))).collect().head.getLong(0) == 0L)
    }
  }

  test("heavy hitters: bounded capacity keeps the space-saving guarantees — " +
    "table ≤ capacity, est ≥ true ≥ est − overcount, frequent words present") {
    withRocksDb {
      import org.apache.spark.sql.functions.{col, explode, split, pmod, xxhash64, count => cnt, lit}
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[Doc].collect().toSeq
      val capacity = 32
      val shards = 4
      val sharded = docs.toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("w"))
        .select(pmod(xxhash64(col("w")), lit(shards)).cast("long").as("shard"), col("w"))
      val truth = sharded.groupBy(col("shard"), col("w")).agg(cnt(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val shardTotals = truth.groupBy(_._1._1).view.mapValues(_.values.sum).toMap

      val in = MemoryStream[Doc](spark)
      val name = s"hhb_${System.nanoTime()}"
      val q = EventStreams.heavyHitters(in.toDF(), capacity = capacity, shards = shards)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      in.addData(docs: _*); q.processAllAvailable() // single batch: emissions ARE the final tables
      q.stop()

      val rows = spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      rows.groupBy(_._1).foreach { case (_, rs) =>
        assert(rs.length <= capacity)
      }
      rows.foreach { case (shard, w, est, over) =>
        val t = truth((shard, w))
        assert(est >= t, s"$w: est $est < true $t")
        assert(est - over <= t, s"$w: floor ${est - over} > true $t")
      }
      // completeness: any word with true count > shardTotal/capacity is present
      val present = rows.map(r => (r._1, r._2)).toSet
      truth.foreach { case ((shard, w), n) =>
        if (n > shardTotals(shard).toDouble / capacity)
          assert(present((shard, w)), s"frequent '$w' missing from shard $shard")
      }
    }
  }

  test("heavy hitters: tables survive a kill/restart — counts resume from the " +
    "checkpointed MapState, not from zero") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.{col, explode, split, count => cnt, lit, max}
      val in = MemoryStream[Doc](spark)
      val ckpt = Files.createTempDirectory("graft-hh-ckpt").toString
      val out = Files.createTempDirectory("graft-hh-out").toString
      def start() = EventStreams.heavyHitters(in.toDF())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      in.addData(Doc(1, "alpha beta alpha"), Doc(2, "beta gamma"))
      q1.processAllAvailable(); q1.stop()
      val q2 = start() // MapState restored from the checkpoint
      in.addData(Doc(3, "alpha delta"))
      q2.processAllAvailable(); q2.stop()
      val finalCounts = spark.read.parquet(out)
        .groupBy(col("word")).agg(max(col("count_est")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // alpha: 2 before the kill + 1 after — 3 only if state survived
      assert(finalCounts("alpha") == 3L)
      assert(finalCounts("beta") == 2L)
      assert(finalCounts("gamma") == 1L && finalCounts("delta") == 1L)
    }
  }

  test("streaming contamination: train-first replay of the corpus reproduces " +
    "q246's per-doc gram and coverage counts exactly (batch ≡ stream)") {
    withRocksDb {
      import org.apache.spark.sql.functions.{col, conv, concat, lit, md5,
        substring, when}
      val L = graft.queries.Dedup.SubstrL
      // the same split assignment q246 derives internally
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .withColumn("bucket",
          conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8),
            16, 10).cast("long") % 100)
        .select(col("doc_id"), col("text"),
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
            .otherwise("test").as("split"))
      import spark.implicits._
      val all = docs.as[SplitDoc].collect().toSeq
      val (train, evals) = all.partition(_.split == "train")

      val in = MemoryStream[SplitDoc](spark)
      val name = s"contam_${System.nanoTime()}"
      val q = EventStreams.streamingContamination(in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      in.addData(train: _*); q.processAllAvailable()
      in.addData(evals: _*); q.processAllAvailable()
      q.stop()

      val emitted = spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"), r.getAs[Long]("pos")))
      val got = emitted.groupBy(r => (r._1, r._2)).map { case ((doc, sp), rs) =>
        val covered = rs.flatMap(r => r._3 until (r._3 + L)).toSet
        (doc, sp, rs.length.toLong, covered.size.toLong)
      }.toSet
      val want = graft.queries.Dedup
        .q246SplitContamination(spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"),
          r.getAs[Long]("n_contam_grams"), r.getAs[Long]("n_tokens_covered"))).toSet
      assert(want.nonEmpty, "the corpus must actually exercise contamination")
      assert(got == want)
    }
  }

  test("streaming contamination: the train-gram index survives a kill/restart, " +
    "and flagging is prospective (no retro-flag when train arrives later)") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.col
      val L = 8
      val passageA = (1 to L).map(i => s"a$i").mkString(" ")
      val passageB = (1 to L).map(i => s"b$i").mkString(" ")
      val in = MemoryStream[SplitDoc](spark)
      val ckpt = Files.createTempDirectory("graft-contam-ckpt").toString
      val out = Files.createTempDirectory("graft-contam-out").toString
      def start() = EventStreams.streamingContamination(in.toDF())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      // batch 1: train doc carrying A; eval doc carrying B (B not yet in train)
      in.addData(
        SplitDoc(1L, passageA, "train"),
        SplitDoc(2L, passageB, "val"))
      q1.processAllAvailable(); q1.stop()
      val q2 = start() // index restored from the checkpoint
      // batch 2: eval doc quoting A (train seen BEFORE the restart);
      // train doc carrying B plus an eval doc quoting B in the SAME batch
      in.addData(
        SplitDoc(3L, passageA, "test"),
        SplitDoc(4L, passageB, "train"),
        SplitDoc(5L, passageB, "val"))
      q2.processAllAvailable(); q2.stop()
      val flagged = spark.read.parquet(out)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      // doc 3 only flags if the index survived the restart; doc 5 flags
      // within its own batch; doc 2 must NOT be retro-flagged
      assert(flagged == Set(3L, 5L))
    }
  }

  test("space-saving core: grouped (word,count) ingestion is bit-identical to " +
    "token-by-token — the determinism the bounded batch buffer relies on") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val vocab = (1 to 40).map(i => f"w$i%02d")
      val tokens = Seq.fill(500)(vocab(rnd.nextInt(vocab.size)))
      val capacity = 1 + rnd.nextInt(16)
      val tokenWise: SpaceSaving.Table = scala.collection.mutable.Map.empty
      tokens.sorted.foreach(w => SpaceSaving.ingest(tokenWise, w, 1L, capacity))
      val grouped = SpaceSaving.fromCounts(
        tokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq, capacity)
      assert(tokenWise.toMap == grouped.toMap, s"trial $trial, capacity $capacity")
      assert(grouped.size <= capacity)
    }
  }

  test("space-saving merge: per-word bounds est ≥ true ≥ est − overcount survive " +
    "combining tables over OVERLAPPING streams, and the merged table stays bounded") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      val vocab = (1 to 60).map(i => f"v$i%02d")
      def stream() = Seq.fill(400)(vocab(rnd.nextInt(vocab.size)))
      val (s1, s2) = (stream(), stream())
      val capacity = 4 + rnd.nextInt(12)
      def counts(s: Seq[String]) =
        s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val t1 = SpaceSaving.fromCounts(counts(s1).toSeq, capacity).toMap
      val t2 = SpaceSaving.fromCounts(counts(s2).toSeq, capacity).toMap
      val merged = SpaceSaving.merge(t1, t2, capacity)
      assert(merged.size <= capacity)
      val truth = counts(s1 ++ s2)
      merged.foreach { case (w, (est, over)) =>
        val t = truth.getOrElse(w, 0L)
        assert(est >= t, s"trial $trial '$w': est $est < true $t")
        assert(est - over <= t, s"trial $trial '$w': floor ${est - over} > true $t")
      }
    }
  }

  test("heavy hitters: re-sharding the emitted tables (cluster resize) keeps " +
    "per-word bounds and the capacity bound on every new shard") {
    import org.apache.spark.sql.functions.{col, explode, split, pmod, xxhash64, count => cnt, lit}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val capacity = 32
    val (oldShards, newShards) = (8, 3)
    val tokens = docs.select(explode(split(col("text"), " ")).as("w"))
    // batch twin of the streaming tables: exact per-old-shard counts
    // through the same pure core the processor runs
    val perOldShard = tokens
      .select(pmod(xxhash64(col("w")), lit(oldShards)).cast("long").as("shard"), col("w"))
      .groupBy(col("shard"), col("w")).agg(cnt(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val tables = perOldShard.toSeq.flatMap { case (shard, rows) =>
      SpaceSaving.fromCounts(rows.map(r => (r._2, r._3)), capacity)
        .toSeq.map { case (w, (c, e)) => (shard, w, c, e) }
    }
    import spark.implicits._
    val resharded = EventStreams.reshardHeavyHitters(
      tables.toDF("shard", "word", "count_est", "overcount_max"),
      newShards, capacity).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val truth = tokens
      .select(pmod(xxhash64(col("w")), lit(newShards)).cast("long").as("shard"), col("w"))
      .groupBy(col("shard"), col("w")).agg(cnt(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(resharded.nonEmpty)
    resharded.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.length <= capacity, s"new shard $shard over capacity")
      assert(rs.map(_._2).distinct.length == rs.length, s"duplicate word in shard $shard")
    }
    resharded.foreach { case (shard, w, est, over) =>
      assert(shard >= 0L && shard < newShards.toLong)
      val t = truth((shard, w))
      assert(est >= t, s"'$w'@$shard: est $est < true $t")
      assert(est - over <= t, s"'$w'@$shard: floor ${est - over} > true $t")
    }
  }

  test("re-sharding collapses multi-epoch snapshots to each word's latest " +
    "entry instead of double-counting capacity slots") {
    import spark.implicits._
    // heavyHitters emits a FULL table snapshot per micro-batch; feeding
    // two epochs means every word of the older epoch reappears with a
    // smaller (monotone) count. The reshard must behave exactly as if
    // only the newest snapshot were fed.
    val epoch1 = Seq((0L, "alpha", 3L, 0L), (0L, "beta", 2L, 0L))
    val epoch2 = Seq((0L, "alpha", 9L, 1L), (0L, "beta", 2L, 0L),
      (0L, "gamma", 5L, 0L))
    val both = EventStreams.reshardHeavyHitters(
      (epoch1 ++ epoch2).toDF("shard", "word", "count_est", "overcount_max"),
      newShards = 2, capacity = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val latestOnly = EventStreams.reshardHeavyHitters(
      epoch2.toDF("shard", "word", "count_est", "overcount_max"),
      newShards = 2, capacity = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(both == latestOnly)
    assert(both.toSeq.map(t => (t._1, t._2)).distinct.size == both.size)
  }

  test("space-saving merge rejects a capacity below a table's size (build-" +
    "capacity mismatch fails loudly instead of dropping eviction floors)") {
    val t = SpaceSaving.fromCounts(
      (1 to 8).map(i => (s"w$i", i.toLong)), capacity = 8).toMap
    assertThrows[IllegalArgumentException] {
      SpaceSaving.merge(t, Map.empty, capacity = 4)
    }
  }

  /** Independent CMS reference: row-i bucket from md5 hex chars
    * [7i, 7i+7) — same family as Analytic.cmsBucket, built here from
    * java.security so the Spark expression is cross-checked.
    */
  private def refCmsBucket(word: String, i: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(word.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(7 * i, 7 * i + 7), 16) %
      graft.queries.Analytic.CmsWidth
  }

  private def refCmsRegs(words: Seq[String]): Map[(Long, Long), Long] =
    words.filter(_.matches("^[a-z]+$"))
      .flatMap(w => (0 until graft.queries.Analytic.CmsDepth)
        .map(i => (i.toLong, refCmsBucket(w, i))))
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }

  test("streaming cms: batch-partitioned replay reproduces the reference " +
    "sketch (batch ≡ stream; registers are monotone so latest = max)") {
    withRocksDb {
      import org.apache.spark.sql.functions.{col, max}
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[Doc].collect().toSeq
      val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
      val expected = refCmsRegs(docs.flatMap(_.text.split(" ")))

      val in = MemoryStream[Doc](spark)
      val name = s"cms_${System.nanoTime()}"
      val q = EventStreams.streamingCms(in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      Seq(b1, b2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()

      val got = spark.sql(s"SELECT * FROM $name")
        .groupBy(col("i"), col("bucket")).agg(max(col("reg")).as("reg"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected)
    }
  }

  /** Independent HLL register reference: md5 60-bit prefix, mod-64
    * register, ρ = 55 − bit_length(tail) — the q242 construction
    * rebuilt from java.security.
    */
  private def refHllRegs(docs: Seq[Doc]): Map[Long, Long] = {
    val grams = docs.flatMap { d =>
      val ws = d.text.split(" ")
      ws.toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" "))
    }
    val regs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    grams.foreach { g =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val idx = hv % 64
      val tail = hv >>> 6
      val rho = if (tail == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(tail))
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs.toMap
  }

  test("streaming hll: batch-partitioned replay reproduces the reference " +
    "registers (batch ≡ stream; max-monotone so latest = max)") {
    withRocksDb {
      import org.apache.spark.sql.functions.{col, max}
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[Doc].collect().toSeq
      val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
      val expected = refHllRegs(docs)

      val in = MemoryStream[Doc](spark)
      val name = s"shll_${System.nanoTime()}"
      val q = EventStreams.streamingHll(in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      Seq(b1, b2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()

      val got = spark.sql(s"SELECT * FROM $name")
        .groupBy(col("idx")).agg(max(col("reg")).as("reg"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("streaming hll: registers survive a kill/restart and duplicates are free " +
    "(max is idempotent)") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.{col, max}
      val in = MemoryStream[Doc](spark)
      val ckpt = Files.createTempDirectory("graft-shll-ckpt").toString
      val out = Files.createTempDirectory("graft-shll-out").toString
      def start() = EventStreams.streamingHll(in.toDF())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val d1 = Doc(1, "alpha beta gamma delta")
      val d2 = Doc(2, "epsilon zeta eta")
      val q1 = start()
      in.addData(d1, d2)
      q1.processAllAvailable(); q1.stop()
      val q2 = start()
      in.addData(d1) // an at-least-once re-delivery — must change nothing
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(out)
        .groupBy(col("idx")).agg(max(col("reg")).as("reg"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refHllRegs(Seq(d1, d2)))
    }
  }

  test("streaming cms: registers survive a kill/restart — increments resume " +
    "from the checkpointed ValueState, not from zero") {
    withRocksDb {
      import java.nio.file.Files
      import org.apache.spark.sql.functions.{col, max}
      val in = MemoryStream[Doc](spark)
      val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
      val out = Files.createTempDirectory("graft-cms-out").toString
      def start() = EventStreams.streamingCms(in.toDF())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      in.addData(Doc(1, "alpha beta alpha"), Doc(2, "beta gamma"))
      q1.processAllAvailable(); q1.stop()
      val q2 = start() // ValueStates restored from the checkpoint
      in.addData(Doc(3, "alpha delta"))
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(out)
        .groupBy(col("i"), col("bucket")).agg(max(col("reg")).as("reg"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = refCmsRegs(Seq(
        "alpha", "beta", "alpha", "beta", "gamma", "alpha", "delta"))
      assert(got == expected)
      // point probe off the final registers never undercounts
      Seq(("alpha", 3L), ("beta", 2L), ("gamma", 1L), ("delta", 1L))
        .foreach { case (w, t) =>
          val est = (0 until graft.queries.Analytic.CmsDepth)
            .map(i => got((i.toLong, refCmsBucket(w, i)))).min
          assert(est >= t)
        }
    }
  }
}

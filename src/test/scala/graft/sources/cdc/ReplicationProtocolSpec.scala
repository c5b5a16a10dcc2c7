package graft.sources.cdc

import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.model.{ChangeEvent, Op}

/** The live replication-protocol lane (S1 v2's network half) against the
  * loopback fixture server: connect → START_REPLICATION → decode →
  * per-transaction sink → checkpoint → LSN feedback, then kill/restart
  * resume with no gap and no duplicate — mirroring the reference's
  * at-least-once contract (`connector_test.go:416-648`,
  * `producer_batch.go:141-151`).
  */
class ReplicationProtocolSpec extends SparkSpec {
  import PgOutputFixtures._

  private val pg2024 = 757382400000000L // 2024-01-01 in PG-epoch micros

  private val rel = relationMsg(1, "public", "users", 'd',
    Seq(true -> "id", false -> "name"))

  // 4 row events across 3 transactions; commit LSNs spaced so that
  // endLsn (commit + 8) sits strictly below the next commit
  private def fixtures: Seq[FixtureTxn] = Seq(
    txn(0x100L, pg2024, 1, Seq(insertMsg(1, Seq(Some("1"), Some("alice"))))),
    txn(0x200L, pg2024, 2, Seq(
      insertMsg(1, Seq(Some("2"), Some("bob"))),
      updateMsg(1, Some('K'), Seq(Some("2"), None), Seq(Some("2"), Some("bobby"))))),
    txn(0x300L, pg2024, 3, Seq(deleteMsg(1, 'K', Seq(Some("1"), None)))))

  private def tail(port: Int, ckpt: java.nio.file.Path,
      sink: CommittedTxn => Unit, password: Option[String] = None,
      protoVersion: Int = 1) =
    new ReplicationTail("127.0.0.1", port, "graft", "db", password,
      "graft_slot", "graft_pub", ckpt, sink, receiveTimeoutMs = 15000,
      protoVersion = protoVersion)

  test("connect → decode → checkpoint → LSN feedback, transaction-batched") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures)
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val txns = mutable.ArrayBuffer.empty[CommittedTxn]
      val flushed = tail(server.port, ckpt, txns += _).run(maxTransactions = 3)

      assert(txns.map(_.commitLsn) == Seq(0x100L, 0x200L, 0x300L))
      val events = txns.flatMap(_.events)
      assert(events.map(_.op) == Seq(Op.Insert, Op.Insert, Op.Update, Op.Delete))
      assert(events.head.newData == Map("id" -> "1", "name" -> "alice"))
      // replica identity DEFAULT: PK-only pre-images
      assert(events(2).oldData == Map("id" -> "2"))
      assert(events(2).newData == Map("id" -> "2", "name" -> "bobby"))
      assert(events(3).oldData == Map("id" -> "1") && events(3).newData == null)
      // commit timestamp rides every event (unix epoch)
      assert(events.forall(_.eventTime.getTime == 1704067200000L))

      // checkpoint & client feedback point past the last commit
      assert(flushed == 0x308L)
      assert(new String(Files.readAllBytes(ckpt)).trim == PgWire.lsnString(0x308L))
      val updates = server.statusUpdates.asScala.toSeq
      // first update answers the pre-replay reply-requested keepalive
      // with the pre-ack position; later ones track each commit's ACK
      assert(updates.head.flushedLsn == 0L)
      assert(updates.map(_.flushedLsn).containsSlice(Seq(0x108L, 0x208L, 0x308L)))
      assert(server.requestedStartLsns.asScala.toSeq == Seq(0L))
    } finally server.stop()
  }

  test("kill/restart resumes at the checkpoint: no gap, no duplicate") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures)
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      // "kill" after two acked transactions (client closes cleanly; the
      // fixture txns it acked are gone from any future replay)
      tail(server.port, ckpt, events ++= _.events).run(maxTransactions = 2)
      assert(events.length == 3)
      // restart: resume strictly after the acked endLsn
      tail(server.port, ckpt, events ++= _.events).run(maxTransactions = 1)
      assert(server.requestedStartLsns.asScala.toSeq == Seq(0L, 0x208L))
      // every event exactly once, in order
      assert(events.map(_.op) == Seq(Op.Insert, Op.Insert, Op.Update, Op.Delete))
      assert(events.map(e => Option(e.newData).orElse(Option(e.oldData)).get("id"))
        == Seq("1", "2", "2", "1"))
    } finally server.stop()
  }

  test("stale checkpoint re-delivers (at-least-once, never a gap)") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures)
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      // checkpoint as if only txn1 was confirmed
      Files.write(ckpt, PgWire.lsnString(0x108L).getBytes)
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      tail(server.port, ckpt, events ++= _.events).run(maxTransactions = 2)
      // txn2 + txn3 re-streamed, txn1 never re-sent
      assert(events.map(_.op) == Seq(Op.Insert, Op.Update, Op.Delete))
      assert(server.requestedStartLsns.asScala.toSeq == Seq(0x108L))
    } finally server.stop()
  }

  test("TRUNCATE flows through the live tail: one event per relation, commit-stamped, ACKed in order") {
    // BEGIN; TRUNCATE users; INSERT reload; COMMIT — the pattern the
    // replica lane's one-commit-timestamp tie convention exists for.
    // The reference's listener would drop the 'T' on the floor
    // (connector.go:140-142); the tail must deliver it like any row.
    val server = new ReplicationFixtureServer(Seq(rel), Seq(
      txn(0x100L, pg2024, 1, Seq(insertMsg(1, Seq(Some("1"), Some("alice"))))),
      txn(0x200L, pg2024, 2, Seq(
        truncateMsg(Seq(1), cascade = true),
        insertMsg(1, Seq(Some("2"), Some("reload")))))))
    try {
      val ckpt = Files.createTempDirectory("repl-trunc").resolve("lsn")
      val txns = mutable.ArrayBuffer.empty[CommittedTxn]
      val flushed = tail(server.port, ckpt, txns += _).run(maxTransactions = 2)
      val events = txns.flatMap(_.events)
      assert(events.map(_.op) == Seq(Op.Insert, Op.Truncate, Op.Insert))
      val trunc = events(1)
      assert(trunc.tableNamespace == "public" && trunc.tableName == "users")
      assert(trunc.oldData == null)
      assert(trunc.newData == Map("cascade" -> "true", "restart_identity" -> "false"))
      // the truncate shares its transaction's commit timestamp with the
      // reload — exactly the tie the replica's horizon convention covers
      assert(trunc.eventTime == events(2).eventTime)
      assert(flushed == 0x208L)
    } finally server.stop()
  }

  test("protocol v2: interleaved streamed transactions commit atomically through the live tail") {
    // segments of xid 100 and 200 interleave on the wire — the shape a
    // primary produces when two bulk transactions both exceed
    // logical_decoding_work_mem; subxact 101 aborts before the commit
    val interleaved = Seq(
      FixtureTxn(0x400L, Seq(
        streamStartMsg(100, first = true),
        streamed(100, insertMsg(1, Seq(Some("10"), Some("x")))),
        streamStopMsg(),
        streamStartMsg(200, first = true),
        streamed(200, insertMsg(1, Seq(Some("20"), Some("y")))),
        streamStopMsg(),
        streamStartMsg(100, first = false),
        streamed(100, insertMsg(1, Seq(Some("11"), Some("x2")))),
        streamed(101, insertMsg(1, Seq(Some("12"), Some("aborted-subxact")))),
        streamStopMsg(),
        streamAbortMsg(100, 101),
        streamCommitMsg(100, 0x400L, pg2024))),
      FixtureTxn(0x500L, Seq(
        streamStartMsg(200, first = false),
        streamed(200, insertMsg(1, Seq(Some("21"), Some("y2")))),
        streamStopMsg(),
        streamCommitMsg(200, 0x500L, pg2024 + 1000000L))))
    val server = new ReplicationFixtureServer(Seq(rel), interleaved)
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val capDir = Files.createTempDirectory("repl-cap")
      val cap = ReplicationTail.captureSink(capDir)
      val txns = mutable.ArrayBuffer.empty[CommittedTxn]
      val flushed = tail(server.port, ckpt, t => { txns += t; cap(t) },
        protoVersion = 2).run(maxTransactions = 2)

      // one sink call per Stream Commit, in commit (not start) order
      assert(txns.map(_.commitLsn) == Seq(0x400L, 0x500L))
      assert(txns(0).events.map(_.newData("id")) == Seq("10", "11")) // 12 aborted
      assert(txns(1).events.map(_.newData("id")) == Seq("20", "21"))
      // commit timestamps stamp the whole transaction at Stream Commit
      assert(txns(0).events.forall(_.eventTime.getTime == 1704067200000L))
      assert(txns(1).events.forall(_.eventTime.getTime == 1704067201000L))
      // ACK strictly after each durable commit, through the final endLsn
      assert(flushed == 0x508L)
      assert(server.statusUpdates.asScala.map(_.flushedLsn).toSeq
        .containsSlice(Seq(0x408L, 0x508L)))

      // each capture file replays standalone — including xid 200's,
      // whose first segment arrived interleaved with xid 100's
      val df = spark.read.format("graft-cdc").option("path", capDir.toString).load()
      assert(df.count() == 4)
      val ids = df.selectExpr("newData['id']").collect().map(_.getString(0)).toSet
      assert(ids == Set("10", "11", "20", "21"))
    } finally server.stop()
  }

  test("cleartext password auth: success and loud failure") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures.take(1),
      password = Some("sekret"))
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      tail(server.port, ckpt, events ++= _.events, password = Some("sekret"))
        .run(maxTransactions = 1)
      assert(events.length == 1)

      val bad = intercept[java.io.IOException] {
        tail(server.port, Files.createTempDirectory("repl").resolve("lsn2"),
          _ => (), password = Some("wrong")).run(maxTransactions = 1)
      }
      assert(bad.getMessage.contains("28P01"))
    } finally server.stop()
  }

  test("SCRAM-SHA-256 auth: full RFC 5802 exchange with mutual verification; wrong password fails") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures.take(1),
      password = Some("s3cret"), scram = true)
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      tail(server.port, ckpt, events ++= _.events, password = Some("s3cret"))
        .run(maxTransactions = 1)
      assert(events.length == 1)

      val bad = intercept[java.io.IOException] {
        tail(server.port, Files.createTempDirectory("repl").resolve("lsn2"),
          _ => (), password = Some("wrong")).run(maxTransactions = 1)
      }
      assert(bad.getMessage.contains("28P01"))
    } finally server.stop()
  }

  test("SCRAM: a channel-binding-only server (SCRAM-SHA-256-PLUS) is rejected loudly") {
    // a non-TLS replication connection cannot do channel binding; the
    // client must fail with the advertised list, not hang or NPE
    val server = new ReplicationFixtureServer(Seq(rel), fixtures.take(1),
      password = Some("s3cret"), scram = true,
      saslMechanisms = Some(Seq("SCRAM-SHA-256-PLUS")))
    try {
      val bad = intercept[java.io.IOException] {
        tail(server.port, Files.createTempDirectory("repl").resolve("lsn"),
          _ => (), password = Some("s3cret")).run(maxTransactions = 1)
      }
      assert(bad.getMessage.contains("SCRAM-SHA-256-PLUS") &&
        bad.getMessage.contains("only"))
    } finally server.stop()
  }

  test("SCRAM: a PLUS+plain mechanism list negotiates the plain mechanism") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures.take(1),
      password = Some("s3cret"), scram = true,
      saslMechanisms = Some(Seq("SCRAM-SHA-256-PLUS", "SCRAM-SHA-256")))
    try {
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      tail(server.port, ckpt, events ++= _.events, password = Some("s3cret"))
        .run(maxTransactions = 1)
      assert(events.length == 1)
    } finally server.stop()
  }

  test("SCRAM: a server e= abort mid-exchange surfaces the server's error text") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures.take(1),
      password = Some("s3cret"), scram = true,
      scramAbort = Some("other-error"))
    try {
      val bad = intercept[java.io.IOException] {
        tail(server.port, Files.createTempDirectory("repl").resolve("lsn"),
          _ => (), password = Some("s3cret")).run(maxTransactions = 1)
      }
      assert(bad.getMessage.contains("SCRAM exchange failed") &&
        bad.getMessage.contains("other-error"))
    } finally server.stop()
  }

  test("the reference YAML cdc block drives the live lane via fromConfig") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures.take(1))
    try {
      val cfg = graft.app.ConfigLoader.fromYaml(
        s"""cdc:
           |  host: 127.0.0.1
           |  port: ${server.port}
           |  username: cdc_user
           |  database: cdc_db
           |  publication:
           |    name: cdc_publication
           |  slot:
           |    name: cdc_slot
           |kafka:
           |  brokers: [b:9092]
           |""".stripMargin)
      val ckpt = Files.createTempDirectory("repl").resolve("lsn")
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      ReplicationTail.fromConfig(cfg, ckpt, events ++= _.events,
        receiveTimeoutMs = 15000).run(maxTransactions = 1)
      assert(events.map(_.op) == Seq(Op.Insert))
    } finally server.stop()
  }

  test("live lane E2E: slot → capture → graft-cdc stream → handler → sink, across a tail restart") {
    import org.apache.spark.sql.functions.col
    val server = new ReplicationFixtureServer(Seq(rel), fixtures)
    try {
      val dir = Files.createTempDirectory("live_e2e")
      val wal = dir.resolve("wal")
      Files.createDirectories(wal)
      val ckpt = dir.resolve("lsn")
      // the full reference loop: replication socket feeds the capture
      // directory, Spark streams it through routing + the default
      // handler into the sink
      val events = spark.readStream.format("graft-cdc")
        .option("path", wal.toString).load()
      val records = graft.transform.Handlers.declarative(events,
        graft.route.TopicRouter(Map("public.users" -> "users-topic")), "id")
      val q = records.writeStream.format("memory").queryName("live_e2e")
        .option("checkpointLocation", dir.resolve("spark_ckpt").toString).start()
      try {
        // ingest 2 txns, "crash", restart the tail, ingest the rest
        tail(server.port, ckpt, ReplicationTail.captureSink(wal)).run(maxTransactions = 2)
        q.processAllAvailable()
        tail(server.port, ckpt, ReplicationTail.captureSink(wal)).run(maxTransactions = 1)
        q.processAllAvailable()
        val out = spark.table("live_e2e")
          .select(col("topic"), col("key").cast("string"), col("value").cast("string"))
          .collect()
        assert(out.length == 4) // exactly once: no gap, no duplicate
        assert(out.forall(_.getString(0) == "users-topic"))
        val values = out.map(_.getString(2)).sorted.toSeq
        assert(values.count(_.contains(""""operation":"INSERT"""")) == 2)
        assert(values.count(_.contains(""""operation":"UPDATE"""")) == 1)
        assert(values.count(_.contains(""""operation":"DELETE"""")) == 1)
      } finally q.stop()
    } finally server.stop()
  }

  test("Connector owns the live lane: source.format graft-replication runs tail + pipeline under one lifecycle") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures)
    try {
      val dir = Files.createTempDirectory("conn_live")
      val cfg = graft.app.ConfigLoader.fromYaml(
        s"""cdc:
           |  host: 127.0.0.1
           |  port: ${server.port}
           |  username: cdc_user
           |  database: cdc_db
           |  publication:
           |    name: cdc_publication
           |  slot:
           |    name: cdc_slot
           |source:
           |  format: graft-replication
           |  dir: ${dir.resolve("wal")}
           |  checkpointDir: ${dir.resolve("chk")}
           |  keyField: id
           |kafka:
           |  tableTopicMapping:
           |    public.users: users-topic
           |  brokers: [unused:9092]
           |  producerBatchTickerDuration: 250ms
           |""".stripMargin)
      val out = dir.resolve("out")
      val conn = new graft.app.Connector(spark, cfg, sink = "parquet",
        parquetOutDir = out.toString)
      conn.start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        def count(): Long =
          try spark.read.parquet(out.toString).count() catch { case _: Throwable => 0L }
        while (count() < 4 && System.currentTimeMillis() < deadline)
          Thread.sleep(250)
        assert(count() == 4, "expected all 4 live events through the full connector")
        val rows = spark.read.parquet(out.toString)
          .selectExpr("topic", "cast(value AS string) AS v").collect()
        assert(rows.forall(_.getString(0) == "users-topic"))
        assert(rows.count(_.getString(1).contains(""""operation":"INSERT"""")) == 2)
        // the tail acked everything it sank
        assert(new String(Files.readAllBytes(dir.resolve("chk").resolve("replication.lsn")))
          .trim == PgWire.lsnString(0x308L))
        // replication health metrics tracked each acked commit
        assert(conn.metrics.replicationCommits == 3)
        // the slot activity checker observed the (fixture) slot
        val slotDeadline = System.currentTimeMillis() + 15000
        while (!conn.metrics.slotObserved && System.currentTimeMillis() < slotDeadline)
          Thread.sleep(100)
        assert(conn.metrics.slotObserved && !conn.metrics.slotIsDropped)
      } finally conn.close()
    } finally server.stop()
  }

  test("captureSink lands per-txn .pgo files that replay through graft-cdc") {
    val server = new ReplicationFixtureServer(Seq(rel), fixtures)
    try {
      val dir = Files.createTempDirectory("pgo_capture")
      val ckpt = dir.resolve("lsn")
      tail(server.port, ckpt, ReplicationTail.captureSink(dir.resolve("wal")))
        .run(maxTransactions = 3)
      val files = Files.list(dir.resolve("wal")).iterator().asScala
        .map(_.getFileName.toString).toSeq.sorted
      assert(files == Seq("0000000000000100.pgo", "0000000000000200.pgo",
        "0000000000000300.pgo"))
      // the captured wire files ARE the existing source lane's contract
      val out = spark.read.format("graft-cdc")
        .option("path", dir.resolve("wal").toString).load()
        .orderBy("eventTime", "op").collect()
      assert(out.length == 4)
      assert(out.map(_.getAs[String]("op")).sorted.toSeq
        == Seq("DELETE", "INSERT", "INSERT", "UPDATE"))
    } finally server.stop()
  }
}

package graft.sources.cdc

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.model.Op

/** pgoutput binary wire-format decode (PostgreSQL "Message Formats"
  * docs, protocol v1): golden binary fixtures per message type, the
  * stateful session's ChangeEvent mapping incl. replica-identity DEFAULT
  * PK-only pre-images, and the end-to-end `.pgo` lane through the
  * graft-cdc source.
  */
class PgOutputSpec extends SparkSpec {
  import PgOutput._

  // -- fixture builder: writes the documented format byte-by-byte --------

  private def buf(): ByteBuffer = ByteBuffer.allocate(4096)
  private def fin(b: ByteBuffer): Array[Byte] = {
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def cstr(b: ByteBuffer, s: String): Unit = {
    b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
  }
  private def text(b: ByteBuffer, v: String): Unit = {
    b.put('t'.toByte)
    val bytes = v.getBytes(StandardCharsets.UTF_8)
    b.putInt(bytes.length); b.put(bytes)
  }

  private def beginMsg(lsn: Long, microsSincePgEpoch: Long, xid: Int): Array[Byte] = {
    val b = buf(); b.put('B'.toByte); b.putLong(lsn)
    b.putLong(microsSincePgEpoch); b.putInt(xid); fin(b)
  }
  private def commitMsg(lsn: Long, micros: Long): Array[Byte] = {
    val b = buf(); b.put('C'.toByte); b.put(0.toByte)
    b.putLong(lsn); b.putLong(lsn + 8); b.putLong(micros); fin(b)
  }
  /** cols: (isKey, name). */
  private def relationMsg(relId: Int, ns: String, name: String, ident: Char,
      cols: Seq[(Boolean, String)]): Array[Byte] = {
    val b = buf(); b.put('R'.toByte); b.putInt(relId)
    cstr(b, ns); cstr(b, name); b.put(ident.toByte)
    b.putShort(cols.length.toShort)
    cols.foreach { case (key, cname) =>
      b.put(if (key) 1.toByte else 0.toByte); cstr(b, cname)
      b.putInt(23); b.putInt(-1) // int4, no typmod
    }
    fin(b)
  }
  /** cells: Some(text) | None (null) | marker strings for 'u'/'b'. */
  private def tupleBytes(b: ByteBuffer, cells: Seq[Option[String]]): Unit = {
    b.putShort(cells.length.toShort)
    cells.foreach {
      case Some(v) if v == "<u>" => b.put('u'.toByte)
      case Some(v)               => text(b, v)
      case None                  => b.put('n'.toByte)
    }
  }
  private def insertMsg(relId: Int, cells: Seq[Option[String]]): Array[Byte] = {
    val b = buf(); b.put('I'.toByte); b.putInt(relId); b.put('N'.toByte)
    tupleBytes(b, cells); fin(b)
  }
  private def updateMsg(relId: Int, oldKind: Option[Char],
      oldCells: Seq[Option[String]], newCells: Seq[Option[String]]): Array[Byte] = {
    val b = buf(); b.put('U'.toByte); b.putInt(relId)
    oldKind.foreach { k => b.put(k.toByte); tupleBytes(b, oldCells) }
    b.put('N'.toByte); tupleBytes(b, newCells); fin(b)
  }
  private def deleteMsg(relId: Int, kind: Char,
      cells: Seq[Option[String]]): Array[Byte] = {
    val b = buf(); b.put('D'.toByte); b.putInt(relId); b.put(kind.toByte)
    tupleBytes(b, cells); fin(b)
  }

  // -- protocol v2 (streamed in-progress transactions) builders ----------

  private def streamStartMsg(xid: Int, first: Boolean): Array[Byte] = {
    val b = buf(); b.put('S'.toByte); b.putInt(xid)
    b.put(if (first) 1.toByte else 0.toByte); fin(b)
  }
  private def streamStopMsg(): Array[Byte] = Array('E'.toByte)
  private def streamCommitMsg(xid: Int, lsn: Long, micros: Long): Array[Byte] = {
    val b = buf(); b.put('c'.toByte); b.putInt(xid); b.put(0.toByte)
    b.putLong(lsn); b.putLong(lsn + 8); b.putLong(micros); fin(b)
  }
  private def streamAbortMsg(xid: Int, subXid: Int): Array[Byte] = {
    val b = buf(); b.put('A'.toByte); b.putInt(xid); b.putInt(subXid); fin(b)
  }
  /** Prefix an object message with the in-stream xid (v2 wire shape). */
  private def streamed(xid: Int, inner: Array[Byte]): Array[Byte] = {
    val b = buf(); b.put(inner(0)); b.putInt(xid)
    b.put(inner, 1, inner.length - 1); fin(b)
  }
  private def logicalMsg(transactional: Boolean, lsn: Long, prefix: String,
      content: Array[Byte]): Array[Byte] = {
    val b = buf(); b.put('M'.toByte)
    b.put(if (transactional) 1.toByte else 0.toByte)
    b.putLong(lsn); cstr(b, prefix); b.putInt(content.length); b.put(content); fin(b)
  }

  private def frame(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val b = ByteBuffer.allocate(msgs.map(_.length + 4).sum)
    msgs.foreach { m => b.putInt(m.length); b.put(m) }
    fin(b)
  }

  // -- decoder unit tests ------------------------------------------------

  test("Begin/Commit decode with PG-epoch → unix-epoch timestamp shift") {
    // 2024-01-01T00:00:00Z = 757382400000000 µs after 2000-01-01
    val pgMicros = 757382400000000L
    val unixMicros = 1704067200000000L
    decode(beginMsg(0x01000028L, pgMicros, 42)) match {
      case Begin(lsn, micros, xid) =>
        assert(lsn == 0x01000028L && micros == unixMicros && xid == 42)
      case other => fail(s"expected Begin, got $other")
    }
    decode(commitMsg(0x01000028L, pgMicros)) match {
      case Commit(flags, clsn, elsn, micros) =>
        assert(flags == 0 && clsn == 0x01000028L && elsn == 0x01000030L &&
          micros == unixMicros)
      case other => fail(s"expected Commit, got $other")
    }
  }

  test("hand-written INSERT byte literal decodes (endianness anchor)") {
    // 'I', relid=1 (BE), 'N', ncols=2 (BE), 't' len=1 '7', 'n'
    val raw = Array(0x49, 0, 0, 0, 1, 0x4e, 0, 2, 0x74, 0, 0, 0, 1, 0x37, 0x6e)
      .map(_.toByte)
    assert(decode(raw) == Insert(1, IndexedSeq(TextCell("7"), NullCell)))
  }

  test("Relation decodes columns, key flags, replica identity, pg_catalog default ns") {
    val m = decode(relationMsg(77, "public", "users", 'f',
      Seq(true -> "id", false -> "name")))
    assert(m == Relation(77, "public", "users", 'f', IndexedSeq(
      Col(isKey = true, "id", 23, -1), Col(isKey = false, "name", 23, -1))))
    val catalogNs = decode(relationMsg(3, "", "pg_class", 'd', Seq(true -> "oid")))
    assert(catalogNs.asInstanceOf[Relation].namespace == "pg_catalog")
  }

  test("Update decodes all three pre-image shapes; Delete requires K or O") {
    val noOld = decode(updateMsg(7, None, Nil, Seq(Some("1"), Some("x"))))
    assert(noOld == Update(7, None, None, IndexedSeq(TextCell("1"), TextCell("x"))))
    val withKey = decode(updateMsg(7, Some('K'), Seq(Some("1"), None), Seq(Some("2"), Some("x"))))
    assert(withKey == Update(7, Some('K'), Some(IndexedSeq(TextCell("1"), NullCell)),
      IndexedSeq(TextCell("2"), TextCell("x"))))
    val withOld = decode(updateMsg(7, Some('O'), Seq(Some("1"), Some("a")), Seq(Some("1"), Some("b"))))
    assert(withOld.asInstanceOf[Update].oldKind.contains('O'))
    assert(decode(deleteMsg(7, 'K', Seq(Some("1"), None))) ==
      Delete(7, 'K', IndexedSeq(TextCell("1"), NullCell)))
    intercept[IllegalArgumentException](decode(deleteMsg(7, 'N', Seq(Some("1")))))
  }

  test("unchanged-TOAST and Type/Origin/Truncate messages decode") {
    val upd = decode(updateMsg(7, None, Nil, Seq(Some("1"), Some("<u>"))))
    assert(upd == Update(7, None, None, IndexedSeq(TextCell("1"), UnchangedCell)))
    val y = buf(); y.put('Y'.toByte); y.putInt(600); cstr(y, "public"); cstr(y, "mood")
    assert(decode(fin(y)) == TypeMsg(600, "public", "mood"))
    val o = buf(); o.put('O'.toByte); o.putLong(5L); cstr(o, "origin1")
    assert(decode(fin(o)) == Origin(5L, "origin1"))
    val t = buf(); t.put('T'.toByte); t.putInt(2); t.put(3.toByte)
    t.putInt(7); t.putInt(8)
    assert(decode(fin(t)) == Truncate(Seq(7, 8), cascade = true, restartIdentity = true))
  }

  // -- session tests -----------------------------------------------------

  private val pg2024 = 757382400000000L // 2024-01-01T00:00:00Z since PG epoch

  test("session maps a full transaction to ChangeEvents with commit-time stamps") {
    val s = new PgOutputSession
    val msgs = Seq(
      relationMsg(16384, "public", "users", 'f', Seq(true -> "id", false -> "name")),
      beginMsg(100L, pg2024, 1),
      insertMsg(16384, Seq(Some("1"), Some("alice"))),
      updateMsg(16384, Some('O'), Seq(Some("1"), Some("alice")), Seq(Some("1"), Some("bob"))),
      deleteMsg(16384, 'O', Seq(Some("1"), Some("bob"))),
      commitMsg(100L, pg2024))
    val events = msgs.flatMap(m => s.feed(m)).map(_.toChangeEvent)
    assert(events.map(_.op) == Seq(Op.Insert, Op.Update, Op.Delete))
    assert(events.forall(_.eventTime.getTime == 1704067200000L))
    assert(events.forall(e => e.tableNamespace == "public" && e.tableName == "users"))
    assert(events(0).oldData == null &&
      events(0).newData == Map("id" -> "1", "name" -> "alice"))
    assert(events(1).oldData == Map("id" -> "1", "name" -> "alice") &&
      events(1).newData == Map("id" -> "1", "name" -> "bob"))
    assert(events(2).newData == null &&
      events(2).oldData == Map("id" -> "1", "name" -> "bob"))
  }

  test("replica identity DEFAULT: PK-only pre-images on DELETE and key-change UPDATE") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "users", 'd', Seq(true -> "id", false -> "name")))
    s.feed(beginMsg(10L, pg2024, 2))
    // DELETE under DEFAULT: 'K' tuple pads non-key columns with nulls —
    // the pre-image must keep ONLY the key column
    val del = s.feed(deleteMsg(1, 'K', Seq(Some("9"), None))).head.toChangeEvent
    assert(del.oldData == Map("id" -> "9") && del.newData == null)
    // UPDATE that changed the key: 'K' pre-image, key column only
    val upd = s.feed(updateMsg(1, Some('K'), Seq(Some("9"), None),
      Seq(Some("10"), Some("z")))).head.toChangeEvent
    assert(upd.oldData == Map("id" -> "9"))
    assert(upd.newData == Map("id" -> "10", "name" -> "z"))
    // UPDATE that did not change the key: no pre-image at all
    val upd2 = s.feed(updateMsg(1, None, Nil, Seq(Some("10"), Some("w")))).head.toChangeEvent
    assert(upd2.oldData == null && upd2.newData == Map("id" -> "10", "name" -> "w"))
  }

  test("in-stream Relation message applies a schema change mid-stream") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id")))
    s.feed(beginMsg(10L, pg2024, 3))
    assert(s.feed(insertMsg(1, Seq(Some("1")))).head.newData == Seq("id" -> "1"))
    // DDL adds a column: pgoutput re-sends the Relation before the next row
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id", false -> "extra")))
    assert(s.feed(insertMsg(1, Seq(Some("2"), Some("e")))).head.newData ==
      Seq("id" -> "2", "extra" -> "e"))
    // row event for a relation never announced fails loudly
    intercept[IllegalStateException](s.feed(insertMsg(99, Seq(Some("1")))))
  }

  test("unchanged-TOAST columns are omitted from the post-image") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "docs", 'd', Seq(true -> "id", false -> "body")))
    s.feed(beginMsg(10L, pg2024, 4))
    val ev = s.feed(updateMsg(1, None, Nil, Seq(Some("5"), Some("<u>")))).head
    assert(ev.newData == Seq("id" -> "5")) // body not sent, not fabricated
  }

  test("decode round-trips randomized messages (unicode names/values, all cell kinds)") {
    import org.scalacheck.Gen
    val name = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', 'ü', '表')))
      .map(_.mkString.take(24))
    val cell = Gen.oneOf(
      Gen.const(None),                               // 'n'
      Gen.const(Some("<u>")),                        // 'u'
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('✓'))).map(cs => Some(cs.mkString)))
    val cols = Gen.nonEmptyListOf(Gen.zip(Gen.oneOf(true, false), name)).map(_.take(8))
    def expect(c: Option[String]): Cell = c match {
      case None        => NullCell
      case Some("<u>") => UnchangedCell
      case Some(v)     => TextCell(v)
    }
    (1 to 50).foreach { _ =>
      val cs = cols.sample.getOrElse(List(true -> "id"))
      val relId = Gen.chooseNum(1, Int.MaxValue).sample.getOrElse(1)
      val ns = name.sample.getOrElse("public")
      val rel = name.sample.getOrElse("t")
      decode(relationMsg(relId, ns, rel, 'd', cs)) match {
        case Relation(id, n, r, ident, decoded) =>
          assert(id == relId && n == ns && r == rel && ident == 'd')
          assert(decoded.map(c => (c.isKey, c.name)) == cs.toIndexedSeq)
        case other => fail(s"expected Relation, got $other")
      }
      val cells = (1 to cs.length).map(_ => cell.sample.getOrElse(None))
      assert(decode(insertMsg(relId, cells)) ==
        Insert(relId, cells.map(expect).toIndexedSeq))
      assert(decode(deleteMsg(relId, 'O', cells)) ==
        Delete(relId, 'O', cells.map(expect).toIndexedSeq))
    }
  }

  // -- protocol v2: streamed transactions --------------------------------

  test("v2 control and logical-decoding messages decode from golden bytes") {
    assert(decode(streamStartMsg(700, first = true)) == StreamStart(700, firstSegment = true))
    assert(decode(streamStopMsg()) == StreamStop)
    decode(streamCommitMsg(700, 0x2000L, pg2024)) match {
      case StreamCommit(xid, flags, clsn, elsn, micros) =>
        assert(xid == 700 && flags == 0 && clsn == 0x2000L && elsn == 0x2008L &&
          micros == 1704067200000000L)
      case other => fail(s"expected StreamCommit, got $other")
    }
    assert(decode(streamAbortMsg(700, 701)) == StreamAbort(700, 701))
    decode(logicalMsg(transactional = true, 5L, "wal2json", "hi".getBytes)) match {
      case LogicalMessage(tx, lsn, prefix, content) =>
        assert(tx && lsn == 5L && prefix == "wal2json" &&
          new String(content) == "hi")
      case other => fail(s"expected LogicalMessage, got $other")
    }
    // inside a segment the same INSERT bytes carry a leading xid
    val ins = insertMsg(1, Seq(Some("1")))
    assert(decode(streamed(700, ins), streamedTx = true) ==
      Streamed(700, decode(ins)))
    // outside a segment nothing changes (v1 decode path untouched)
    assert(decode(ins) == Insert(1, IndexedSeq(TextCell("1"))))
  }

  test("session buffers streamed rows until Stream Commit, stamped with commit time") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id")))
    // two segments of xid 900, nothing released until the commit
    assert(s.feed(streamStartMsg(900, first = true)).isEmpty)
    assert(s.feed(streamed(900, insertMsg(1, Seq(Some("1"))))).isEmpty)
    assert(s.feed(streamStopMsg()).isEmpty)
    assert(s.feed(streamStartMsg(900, first = false)).isEmpty)
    assert(s.feed(streamed(900, insertMsg(1, Seq(Some("2"))))).isEmpty)
    assert(s.feed(streamStopMsg()).isEmpty)
    val out = s.feed(streamCommitMsg(900, 0x3000L, pg2024))
    assert(out.map(_.newData.head._2) == Seq("1", "2"))
    assert(out.forall(_.eventTimeMicros == 1704067200000000L))
    // a second commit for the same xid releases nothing
    assert(s.feed(streamCommitMsg(900, 0x3000L, pg2024)).isEmpty)
  }

  test("interleaved streamed transactions commit independently, in wire order") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id")))
    s.feed(streamStartMsg(10, first = true))
    s.feed(streamed(10, insertMsg(1, Seq(Some("a1")))))
    s.feed(streamStopMsg())
    s.feed(streamStartMsg(20, first = true))
    s.feed(streamed(20, insertMsg(1, Seq(Some("b1")))))
    s.feed(streamStopMsg())
    s.feed(streamStartMsg(10, first = false))
    s.feed(streamed(10, insertMsg(1, Seq(Some("a2")))))
    s.feed(streamStopMsg())
    // xid 20 commits first even though 10 started first
    val b = s.feed(streamCommitMsg(20, 0x100L, pg2024))
    assert(b.map(_.newData.head._2) == Seq("b1"))
    val a = s.feed(streamCommitMsg(10, 0x200L, pg2024 + 1L))
    assert(a.map(_.newData.head._2) == Seq("a1", "a2"))
    assert(a.forall(_.eventTimeMicros == 1704067200000001L))
  }

  test("Stream Abort drops exactly the aborted subtransaction's rows") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id")))
    s.feed(streamStartMsg(50, first = true))
    s.feed(streamed(50, insertMsg(1, Seq(Some("keep1")))))
    s.feed(streamed(51, insertMsg(1, Seq(Some("drop1"))))) // subxact 51
    s.feed(streamed(50, insertMsg(1, Seq(Some("keep2")))))
    s.feed(streamStopMsg())
    s.feed(streamAbortMsg(50, 51)) // subtransaction rollback
    val out = s.feed(streamCommitMsg(50, 0x400L, pg2024))
    assert(out.map(_.newData.head._2) == Seq("keep1", "keep2"))
    // full abort: subXid == xid wipes the whole transaction
    s.feed(streamStartMsg(60, first = true))
    s.feed(streamed(60, insertMsg(1, Seq(Some("gone")))))
    s.feed(streamStopMsg())
    s.feed(streamAbortMsg(60, 60))
    assert(s.feed(streamCommitMsg(60, 0x500L, pg2024)).isEmpty)
  }

  test("in-stream Relation (DDL inside a streamed txn) applies to later rows") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id")))
    s.feed(streamStartMsg(70, first = true))
    s.feed(streamed(70, insertMsg(1, Seq(Some("1")))))
    s.feed(streamed(70, relationMsg(1, "public", "t", 'd',
      Seq(true -> "id", false -> "added"))))
    s.feed(streamed(70, insertMsg(1, Seq(Some("2"), Some("x")))))
    s.feed(streamStopMsg())
    val out = s.feed(streamCommitMsg(70, 0x600L, pg2024))
    assert(out.map(_.newData) == Seq(Seq("id" -> "1"), Seq("id" -> "2", "added" -> "x")))
  }

  test("a streamed-transaction .pgo capture replays through graft-cdc") {
    val dir = Files.createTempDirectory("cdc-pgo-v2")
    Files.write(dir.resolve("000001.pgo"), frame(Seq(
      relationMsg(1, "public", "users", 'd', Seq(true -> "id", false -> "name")),
      streamStartMsg(800, first = true),
      streamed(800, insertMsg(1, Seq(Some("1"), Some("alice")))),
      streamed(800, insertMsg(1, Seq(Some("2"), Some("bob")))),
      streamStopMsg(),
      streamStartMsg(800, first = false),
      streamed(800, deleteMsg(1, 'K', Seq(Some("1"), None))),
      streamStopMsg(),
      streamCommitMsg(800, 0x700L, pg2024))))
    val df = spark.read.format("graft-cdc").option("path", dir.toString).load()
    assert(df.count() == 3) // one Stream Commit released the whole txn
    val rows = df.orderBy("op").collect()
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("DELETE", "INSERT", "INSERT"))
    assert(rows.forall(_.getAs[java.sql.Timestamp]("eventTime").getTime == 1704067200000L))
  }

  test("framed replay file round-trips") {
    val msgs = Seq(beginMsg(1L, pg2024, 1), commitMsg(1L, pg2024))
    val back = PgOutput.readFramed(new ByteArrayInputStream(frame(msgs))).toSeq
    assert(back.length == 2 && back(0).sameElements(msgs(0)) && back(1).sameElements(msgs(1)))
  }

  // -- end-to-end through the graft-cdc source ---------------------------

  private def writePgo(dir: Path, name: String, msgs: Seq[Array[Byte]]): Unit =
    Files.write(dir.resolve(name), frame(msgs))

  test("graft-cdc reads .pgo capture files end-to-end with filter pushdown") {
    val dir = Files.createTempDirectory("cdc-pgo")
    writePgo(dir, "000001.pgo", Seq(
      relationMsg(1, "public", "users", 'd', Seq(true -> "id", false -> "name")),
      beginMsg(100L, pg2024, 1),
      insertMsg(1, Seq(Some("1"), Some("alice"))),
      insertMsg(1, Seq(Some("2"), Some("bob"))),
      deleteMsg(1, 'K', Seq(Some("1"), None)),
      commitMsg(100L, pg2024)))
    val df = spark.read.format("graft-cdc").option("path", dir.toString).load()
    assert(df.count() == 3)
    assert(df.schema == graft.model.ChangeEvent.schema)
    val inserts = spark.read.format("graft-cdc").option("path", dir.toString).load()
      .filter("op = 'INSERT'")
    assert(inserts.queryExecution.executedPlan.toString.contains("pushed=["))
    assert(inserts.count() == 2)
    val del = df.filter("op = 'DELETE'").collect()(0)
    assert(del.getAs[Map[String, String]]("oldData") == Map("id" -> "1"))
    assert(del.getAs[java.sql.Timestamp]("eventTime").getTime == 1704067200000L)
  }

  test("a .pgo file streams through the micro-batch lane alongside .json files") {
    val dir = Files.createTempDirectory("cdc-pgo-stream")
    val name = s"pgo_${System.nanoTime()}"
    writePgo(dir, "000001.pgo", Seq(
      relationMsg(1, "public", "users", 'd', Seq(true -> "id")),
      beginMsg(100L, pg2024, 1),
      insertMsg(1, Seq(Some("1"))),
      commitMsg(100L, pg2024)))
    val q = spark.readStream.format("graft-cdc").option("path", dir.toString).load()
      .writeStream.format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.sql(s"SELECT * FROM $name").count() == 1)
      // later segment arrives; relation must be re-announced per capture
      // file (each file is read by an independent partition reader)
      writePgo(dir, "000002.pgo", Seq(
        relationMsg(1, "public", "users", 'd', Seq(true -> "id")),
        beginMsg(200L, pg2024 + 1000000L, 2),
        insertMsg(1, Seq(Some("2"))),
        commitMsg(200L, pg2024 + 1000000L)))
      q.processAllAvailable()
      val rows = spark.sql(s"SELECT newData['id'] AS id FROM $name ORDER BY id").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("1", "2"))
    } finally q.stop()
  }

  // -- adversarial-interleaving properties -------------------------------

  private def truncateMsg(relIds: Seq[Int]): Array[Byte] = {
    val b = buf(); b.put('T'.toByte); b.putInt(relIds.length); b.put(0.toByte)
    relIds.foreach(b.putInt); fin(b)
  }
  private def originMsg(lsn: Long, name: String): Array[Byte] = {
    val b = buf(); b.put('O'.toByte); b.putLong(lsn); cstr(b, name); fin(b)
  }

  test("property: random Relation-change/Truncate/noise interleavings render each row against the schema in force at its position") {
    val layouts = Vector(
      Seq(true -> "id", false -> "a"),
      Seq(true -> "id", false -> "a", false -> "b"),
      Seq(true -> "id"))
    (1 to 30).foreach { trial =>
      val rnd = new scala.util.Random(trial)
      val s = new PgOutputSession
      var cur = 0
      var msgs = Vector[Array[Byte]](relationMsg(1, "public", "t", 'd', layouts(cur)))
      var expected = Vector.empty[(Long, Map[String, String], String)]
      var nextId = 0
      (1 to 1 + rnd.nextInt(4)).foreach { tx =>
        val micros = pg2024 + tx * 1000000L
        msgs :+= beginMsg(tx * 100L, micros, tx)
        (1 to rnd.nextInt(7)).foreach { _ =>
          rnd.nextInt(4) match {
            case 0 => // mid-transaction schema change
              cur = rnd.nextInt(layouts.length)
              msgs :+= relationMsg(1, "public", "t", 'd', layouts(cur))
            case 1 => // Truncate: released as a TRUNCATE event (the
              // reference drops it — connector.go:140-142 — which is
              // exactly the replica-divergence hazard this closes)
              msgs :+= truncateMsg(Seq(1))
              expected :+= ((micros + PgOutput.PgEpochMicros,
                Map("cascade" -> "false", "restart_identity" -> "false"),
                graft.model.Op.Truncate))
            case 2 => // replication-origin noise
              msgs :+= originMsg(rnd.nextLong(1 << 20), s"o$trial")
            case 3 =>
              nextId += 1
              val cells = layouts(cur).indices.map(i => Some(s"v$nextId-$i"))
              msgs :+= insertMsg(1, cells)
              expected :+= ((micros + PgOutput.PgEpochMicros,
                layouts(cur).zipWithIndex
                  .map { case ((_, n), i) => n -> s"v$nextId-$i" }.toMap,
                graft.model.Op.Insert))
          }
        }
        msgs :+= commitMsg(tx * 100L, micros)
      }
      val events = msgs.flatMap(m => s.feed(m))
      assert(events.length == expected.length)
      events.zip(expected).foreach { case (ev, (micros, data, op)) =>
        assert(ev.eventTimeMicros == micros)
        assert(ev.newData.toMap == data)
        assert(ev.op == op)
      }
    }
  }

  test("Truncate fans out one TRUNCATE event per affected relation, commit-time stamped") {
    val s = new PgOutputSession
    val b = buf(); b.put('T'.toByte); b.putInt(2); b.put(3.toByte) // CASCADE|RESTART
    b.putInt(1); b.putInt(2)
    val truncBoth = fin(b)
    val msgs = Seq(
      relationMsg(1, "public", "users", 'd', Seq(true -> "id")),
      relationMsg(2, "app", "orders", 'd', Seq(true -> "oid")),
      beginMsg(100L, pg2024, 1),
      truncBoth,
      commitMsg(100L, pg2024))
    val events = msgs.flatMap(m => s.feed(m))
    assert(events.map(e => (e.tableNamespace, e.tableName, e.op)) == Seq(
      ("public", "users", graft.model.Op.Truncate),
      ("app", "orders", graft.model.Op.Truncate)))
    assert(events.forall(_.eventTimeMicros == pg2024 + PgOutput.PgEpochMicros))
    assert(events.forall(_.oldData == null))
    assert(events.forall(_.newData.toMap ==
      Map("cascade" -> "true", "restart_identity" -> "true")))
  }

  test("Truncate of an unknown relation fails loudly, like any row event would") {
    val s = new PgOutputSession
    val err = intercept[IllegalStateException](s.feed(truncateMsg(Seq(99))))
    assert(err.getMessage.contains("unknown relation 99"))
  }

  test("a streamed transaction's Truncate is buffered until Stream Commit") {
    val s = new PgOutputSession
    s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id")))
    assert(s.feed(streamStartMsg(500, first = true)).isEmpty)
    assert(s.feed(streamed(500, truncateMsg(Seq(1)))).isEmpty) // buffered
    assert(s.feed(streamStopMsg()).isEmpty)
    val out = s.feed(streamCommitMsg(500, 900L, pg2024))
    assert(out.map(_.op) == Seq(graft.model.Op.Truncate))
    assert(out.head.eventTimeMicros == pg2024 + PgOutput.PgEpochMicros)
  }

  test("property: interleaved streamed segments with random aborts release exactly the surviving rows at commit, never earlier") {
    val xids = Seq(900, 901)
    (1 to 30).foreach { trial =>
      val rnd = new scala.util.Random(1000 + trial)
      val s = new PgOutputSession
      assert(s.feed(relationMsg(1, "public", "t", 'd', Seq(true -> "id"))).isEmpty)
      val pendingExp = scala.collection.mutable.Map(
        900 -> Vector.empty[(Int, String)], 901 -> Vector.empty[(Int, String)])
      val first = scala.collection.mutable.Set(900, 901)
      var n = 0
      (1 to 2 + rnd.nextInt(5)).foreach { _ =>
        val xid = xids(rnd.nextInt(2))
        assert(s.feed(streamStartMsg(xid, first.remove(xid))).isEmpty)
        (0 until rnd.nextInt(4)).foreach { _ =>
          n += 1
          val sub = xid + rnd.nextInt(2) * 1000 // top xid or a subtransaction
          assert(s.feed(streamed(sub, insertMsg(1, Seq(Some(n.toString))))).isEmpty)
          pendingExp(xid) :+= ((sub, n.toString))
        }
        assert(s.feed(streamStopMsg()).isEmpty)
        if (rnd.nextInt(3) == 0) { // random abort between segments
          val sub = xid + rnd.nextInt(2) * 1000
          assert(s.feed(streamAbortMsg(xid, sub)).isEmpty)
          pendingExp(xid) =
            if (sub == xid) Vector.empty // whole-transaction abort
            else pendingExp(xid).filter(_._1 != sub)
        }
      }
      xids.foreach { xid =>
        val got = s.feed(streamCommitMsg(xid, 0x9000L, pg2024))
        assert(got.map(_.newData.toMap.apply("id")) == pendingExp(xid).map(_._2))
        assert(got.forall(_.eventTimeMicros == pg2024 + PgOutput.PgEpochMicros))
      }
    }
  }

  test("property: torn/coalesced CopyData byte boundaries never corrupt the wire reader") {
    import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream}
    // a realistic tail: keepalives interleaved with XLogData frames
    // wrapping pgoutput payloads
    val payloads = Seq(
      relationMsg(1, "public", "t", 'd', Seq(true -> "id", false -> "a")),
      beginMsg(100L, pg2024, 1),
      insertMsg(1, Seq(Some("1"), Some("x"))),
      updateMsg(1, Some('K'), Seq(Some("1"), None), Seq(Some("1"), Some("y"))),
      deleteMsg(1, 'K', Seq(Some("1"), None)),
      commitMsg(100L, pg2024))
    def copyData(inner: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(inner.length + 25)
      b.put('w'.toByte).putLong(1L).putLong(2L).putLong(3L).put(inner); fin(b)
    }
    def keepalive(): Array[Byte] = {
      val b = ByteBuffer.allocate(18)
      b.put('k'.toByte).putLong(9L).putLong(9L).put(0.toByte); fin(b)
    }
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    payloads.foreach { p =>
      PgWire.writeMessage(out, 'd', keepalive())
      PgWire.writeMessage(out, 'd', copyData(p))
    }
    val wire = bos.toByteArray
    (1 to 20).foreach { trial =>
      val rnd = new scala.util.Random(trial)
      // dribble 1–4 bytes per read: every frame boundary gets torn
      val torn: InputStream = new InputStream {
        private var pos = 0
        override def read(): Int =
          if (pos >= wire.length) -1 else { val v = wire(pos) & 0xff; pos += 1; v }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          if (pos >= wire.length) return -1
          val k = math.min(len, math.min(1 + rnd.nextInt(4), wire.length - pos))
          System.arraycopy(wire, pos, b, off, k); pos += k; k
        }
      }
      val in = new DataInputStream(torn)
      val s = new PgOutputSession
      val events = (1 to payloads.length * 2).flatMap { _ =>
        val (typ, body) = PgWire.readMessage(in)
        assert(typ == 'd')
        PgWire.decodeCopyPayload(body) match {
          case PgWire.XLogData(_, _, _, p) => s.feed(p)
          case _: PgWire.Keepalive         => Nil
          case other => fail(s"unexpected payload $other")
        }
      }
      assert(in.read() == -1) // stream fully consumed, nothing left over
      assert(events.map(_.op) == Seq(Op.Insert, Op.Update, Op.Delete))
      assert(events(1).oldData.toMap == Map("id" -> "1")) // 'K' PK-only
      assert(events.forall(_.eventTimeMicros == pg2024 + PgOutput.PgEpochMicros))
    }
  }
}

package graft.sources.cdc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable

/** One canned transaction: pgoutput payloads Begin..Commit, replayed as
  * XLogData frames whose positions end at `commitLsn`.
  */
final case class FixtureTxn(commitLsn: Long, payloads: Seq[Array[Byte]])

/** Loopback stand-in for a PostgreSQL primary's replication endpoint:
  * accepts `replication=database` startup (trust or cleartext password),
  * answers `START_REPLICATION SLOT ... LOGICAL <lsn>` with CopyBoth and
  * replays the fixture transactions strictly after `<lsn>`, exactly how
  * a real primary resumes from confirmed_flush. Sends one
  * reply-requested keepalive before the replay (exercising the client's
  * inline feedback path) and records every standby status update the
  * client sends. Each connection is served on its own thread (a slot
  * checker polls concurrently with the tail), so kill/restart tests
  * drive resume against the same server instance.
  *
  * Also answers the bootstrap/monitoring surface over the simple-query
  * protocol: `pg_publication` / `pg_replication_slots` probes against
  * the `publicationExists` / `slotExists` knobs (both default true so
  * plain-tail tests see an already-provisioned primary),
  * `CREATE PUBLICATION` / `ALTER TABLE ... REPLICA IDENTITY` /
  * `CREATE_REPLICATION_SLOT` recorded into [[executedDdl]] and flipping
  * the knobs — the state transition a real primary performs.
  */
final class ReplicationFixtureServer(schemaPayloads: Seq[Array[Byte]],
    transactions: Seq[FixtureTxn], password: Option[String] = None,
    scram: Boolean = false,
    // error-path knobs: advertise a custom SASL mechanism list (e.g.
    // SCRAM-SHA-256-PLUS only, a channel-binding-required server), or
    // abort the exchange with an RFC 5802 e= attribute mid-flight
    saslMechanisms: Option[Seq[String]] = None,
    scramAbort: Option[String] = None) {
  import PgWire._

  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort

  /** Every standby status update received, across all connections. */
  val statusUpdates = new ConcurrentLinkedQueue[StandbyStatus]
  /** The start LSN each connection's START_REPLICATION requested. */
  val requestedStartLsns = new ConcurrentLinkedQueue[java.lang.Long]
  /** Every DDL / replication command executed (bootstrap assertions). */
  val executedDdl = new ConcurrentLinkedQueue[String]

  /** Canned catalog state the bootstrap queries observe. */
  @volatile var publicationExists = true
  @volatile var slotExists = true
  @volatile var slotActive = false
  @volatile var slotConfirmedFlushLsn = 0x100L
  @volatile var slotRestartLsn = 0x80L
  @volatile var currentWalLsn = 0x400L

  @volatile private var running = true
  private val acceptThread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => {
          try serve(sock) catch { case _: Throwable => () }
          finally sock.close()
        }, "replication-fixture-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // closed during accept
    }
  }, "replication-fixture-server")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    // untyped startup packet
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    val params = parseStartup(body)
    require(params.get("replication").contains("database"),
      "fixture server only accepts replication connections")
    def authCode(code: Int, extra: Array[Byte] = Array.empty): Unit =
      writeMessage(out, 'R',
        java.nio.ByteBuffer.allocate(4 + extra.length).putInt(code).put(extra).array())
    password match {
      case Some(expected) if scram =>
        import ScramSha256._
        // AuthenticationSASL with the mechanism list (null-terminated)
        val mechList = saslMechanisms.getOrElse(Seq(Mechanism))
        authCode(10, (mechList.mkString("\u0000") + "\u0000\u0000")
          .getBytes(StandardCharsets.UTF_8))
        val (t1, ibody) = readMessage(in)
        require(t1 == 'p', s"expected SASLInitialResponse, got '$t1'")
        val ib = java.nio.ByteBuffer.wrap(ibody)
        val mechEnd = ibody.indexOf(0.toByte)
        require(new String(ibody, 0, mechEnd, StandardCharsets.UTF_8) == Mechanism)
        ib.position(mechEnd + 1)
        val ilen = ib.getInt
        val clientFirst = new String(ibody, ib.position(), ilen, StandardCharsets.UTF_8)
        require(clientFirst.startsWith("n,,"), "fixture expects no channel binding")
        val clientFirstBare = clientFirst.drop(3)
        val clientNonce = attrs(clientFirstBare)('r')
        val salt = "graft-fixture-salt".getBytes(StandardCharsets.UTF_8)
        val iterations = 4096
        val fullNonce = clientNonce + "srvext"
        val serverFirst = s"r=$fullNonce,s=${b64(salt)},i=$iterations"
        authCode(11, serverFirst.getBytes(StandardCharsets.UTF_8))
        val (t2, fbody) = readMessage(in)
        require(t2 == 'p', s"expected SASLResponse, got '$t2'")
        val clientFinal = new String(fbody, StandardCharsets.UTF_8)
        val fa = attrs(clientFinal)
        val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
        val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
        val salted = saltedPassword(expected, salt, iterations)
        val clientKey = hmac(salted, "Client Key")
        val storedKey = sha256(clientKey)
        val recoveredKey = xor(unb64(fa('p')), hmac(storedKey, authMessage))
        if (fa('r') != fullNonce ||
            !java.util.Arrays.equals(sha256(recoveredKey), storedKey)) {
          writeMessage(out, 'E',
            fieldsBody("FATAL", "28P01", "password authentication failed"))
          return
        }
        if (scramAbort.isDefined) {
          authCode(12, s"e=${scramAbort.get}".getBytes(StandardCharsets.UTF_8))
          return
        }
        val serverSig = b64(hmac(hmac(salted, "Server Key"), authMessage))
        authCode(12, s"v=$serverSig".getBytes(StandardCharsets.UTF_8))
        authCode(0)
      case Some(expected) =>
        authCode(3)
        val (t, pbody) = readMessage(in)
        require(t == 'p', s"expected PasswordMessage, got '$t'")
        val got = new String(pbody, 0, pbody.length - 1, StandardCharsets.UTF_8)
        if (got != expected) {
          writeMessage(out, 'E',
            fieldsBody("FATAL", "28P01", "password authentication failed"))
          return
        }
        authCode(0)
      case None =>
        authCode(0)
    }
    writeMessage(out, 'Z', Array('I'.toByte))

    // text-format result set: RowDescription + DataRows + complete + ready
    def sendRows(cols: Seq[String], rows: Seq[Seq[Option[String]]]): Unit = {
      val t = new java.io.ByteArrayOutputStream()
      val td = new java.io.DataOutputStream(t)
      td.writeShort(cols.length)
      cols.foreach { c =>
        td.write(c.getBytes(StandardCharsets.UTF_8)); td.write(0)
        td.writeInt(0); td.writeShort(0); td.writeInt(25) // text oid
        td.writeShort(-1); td.writeInt(-1); td.writeShort(0)
      }
      writeMessage(out, 'T', t.toByteArray)
      rows.foreach { row =>
        val d = new java.io.ByteArrayOutputStream()
        val dd = new java.io.DataOutputStream(d)
        dd.writeShort(row.length)
        row.foreach {
          case Some(v) =>
            val b = v.getBytes(StandardCharsets.UTF_8)
            dd.writeInt(b.length); dd.write(b)
          case None => dd.writeInt(-1)
        }
        writeMessage(out, 'D', d.toByteArray)
      }
      complete(s"SELECT ${rows.length}")
    }
    def complete(tag: String): Unit = {
      writeMessage(out, 'C', tag.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
      writeMessage(out, 'Z', Array('I'.toByte))
    }

    // simple-query loop until START_REPLICATION flips to COPY-both
    var startLsn = -1L
    val lsnRe = "START_REPLICATION SLOT \\S+ LOGICAL ([0-9A-Fa-f]+/[0-9A-Fa-f]+)".r
    while (startLsn < 0) {
      val (qt, qbody) = readMessage(in)
      if (qt == 'X') return
      require(qt == 'Q', s"expected Query, got '$qt'")
      val sql = new String(qbody, 0, qbody.length - 1, StandardCharsets.UTF_8)
      lsnRe.findFirstMatchIn(sql) match {
        case Some(m) => startLsn = parseLsn(m.group(1))
        case None => sql match {
          case s if s.contains("FROM pg_publication") =>
            sendRows(Seq("pubname"),
              if (publicationExists) Seq(Seq(Some("pub"))) else Seq.empty)
          case s if s.contains("FROM pg_replication_slots") && slotExists =>
            sendRows(
              Seq("active", "active_pid", "confirmed_flush_lsn", "restart_lsn",
                "current_lsn"),
              Seq(Seq(Some(if (slotActive) "t" else "f"),
                if (slotActive) Some("4242") else None,
                Some(lsnString(slotConfirmedFlushLsn)),
                Some(lsnString(slotRestartLsn)),
                Some(lsnString(currentWalLsn)))))
          case s if s.contains("FROM pg_replication_slots") =>
            sendRows(Seq("active", "active_pid", "confirmed_flush_lsn",
              "restart_lsn", "current_lsn"), Seq.empty)
          case s if s.startsWith("CREATE_REPLICATION_SLOT") =>
            executedDdl.add(s); slotExists = true
            sendRows(
              Seq("slot_name", "consistent_point", "snapshot_name", "output_plugin"),
              Seq(Seq(Some(s.split("\\s+")(1)), Some(lsnString(currentWalLsn)),
                None, Some("pgoutput"))))
          case s if s.startsWith("CREATE PUBLICATION") =>
            executedDdl.add(s); publicationExists = true
            complete("CREATE PUBLICATION")
          case s if s.startsWith("ALTER TABLE") =>
            executedDdl.add(s)
            complete("ALTER TABLE")
          case s =>
            writeMessage(out, 'E',
              fieldsBody("ERROR", "42601", s"unsupported command: $s"))
            writeMessage(out, 'Z', Array('I'.toByte))
        }
      }
    }
    requestedStartLsns.add(startLsn)

    // CopyBothResponse: format 0, no columns
    writeMessage(out, 'W', Array[Byte](0, 0, 0))
    def xlog(pos: Long, payload: Array[Byte]): Unit =
      writeMessage(out, 'd', encodeXLogData(XLogData(pos, pos, nowPgMicros(), payload)))
    // liveness probe before any data: the client must answer with its
    // current (pre-replay) flushed position
    writeMessage(out, 'd',
      encodeKeepalive(Keepalive(startLsn, nowPgMicros(), replyRequested = true)))
    // schema prefix (PG re-sends Relation messages per connection)
    schemaPayloads.foreach(p => xlog(startLsn, p))
    // resume semantics: strictly after the confirmed position
    transactions.filter(_.commitLsn > startLsn).foreach { txn =>
      txn.payloads.foreach(p => xlog(txn.commitLsn, p))
    }
    // drain feedback until the client disconnects (or Terminates)
    try {
      var open = true
      while (open) {
        val (t, b) = readMessage(in)
        t match {
          case 'd' => decodeCopyPayload(b) match {
            case s: StandbyStatus => statusUpdates.add(s)
            case _ => ()
          }
          case 'X' => open = false
          case _   => ()
        }
      }
    } catch { case _: EOFException => () }
  }

  def stop(): Unit = {
    running = false
    server.close()
  }
}

/** pgoutput payload builders for protocol-level fixtures (same
  * byte-by-byte construction as PgOutputSpec's golden fixtures).
  */
object PgOutputFixtures {
  import java.nio.ByteBuffer

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
  private def tupleBytes(b: ByteBuffer, cells: Seq[Option[String]]): Unit = {
    b.putShort(cells.length.toShort)
    cells.foreach {
      case Some(v) => text(b, v)
      case None    => b.put('n'.toByte)
    }
  }

  def beginMsg(lsn: Long, microsSincePgEpoch: Long, xid: Int): Array[Byte] = {
    val b = buf(); b.put('B'.toByte); b.putLong(lsn)
    b.putLong(microsSincePgEpoch); b.putInt(xid); fin(b)
  }
  def commitMsg(lsn: Long, micros: Long): Array[Byte] = {
    val b = buf(); b.put('C'.toByte); b.put(0.toByte)
    b.putLong(lsn); b.putLong(lsn + 8); b.putLong(micros); fin(b)
  }
  def relationMsg(relId: Int, ns: String, name: String, ident: Char,
      cols: Seq[(Boolean, String)]): Array[Byte] = {
    val b = buf(); b.put('R'.toByte); b.putInt(relId)
    cstr(b, ns); cstr(b, name); b.put(ident.toByte)
    b.putShort(cols.length.toShort)
    cols.foreach { case (key, cname) =>
      b.put(if (key) 1.toByte else 0.toByte); cstr(b, cname)
      b.putInt(23); b.putInt(-1)
    }
    fin(b)
  }
  def insertMsg(relId: Int, cells: Seq[Option[String]]): Array[Byte] = {
    val b = buf(); b.put('I'.toByte); b.putInt(relId); b.put('N'.toByte)
    tupleBytes(b, cells); fin(b)
  }
  def updateMsg(relId: Int, oldKind: Option[Char],
      oldCells: Seq[Option[String]], newCells: Seq[Option[String]]): Array[Byte] = {
    val b = buf(); b.put('U'.toByte); b.putInt(relId)
    oldKind.foreach { k => b.put(k.toByte); tupleBytes(b, oldCells) }
    b.put('N'.toByte); tupleBytes(b, newCells); fin(b)
  }
  def deleteMsg(relId: Int, kind: Char, cells: Seq[Option[String]]): Array[Byte] = {
    val b = buf(); b.put('D'.toByte); b.putInt(relId); b.put(kind.toByte)
    tupleBytes(b, cells); fin(b)
  }
  def truncateMsg(relIds: Seq[Int], cascade: Boolean = false,
      restartIdentity: Boolean = false): Array[Byte] = {
    val b = buf(); b.put('T'.toByte); b.putInt(relIds.length)
    b.put(((if (cascade) 1 else 0) | (if (restartIdentity) 2 else 0)).toByte)
    relIds.foreach(b.putInt); fin(b)
  }

  /** A simple single-table transaction: Begin, rows, Commit. */
  def txn(commitLsn: Long, micros: Long, xid: Int,
      rows: Seq[Array[Byte]]): FixtureTxn =
    FixtureTxn(commitLsn,
      beginMsg(commitLsn, micros, xid) +: rows :+ commitMsg(commitLsn, micros))

  // -- protocol v2 (streamed in-progress transactions) -------------------

  def streamStartMsg(xid: Int, first: Boolean): Array[Byte] = {
    val b = buf(); b.put('S'.toByte); b.putInt(xid)
    b.put(if (first) 1.toByte else 0.toByte); fin(b)
  }
  def streamStopMsg(): Array[Byte] = Array('E'.toByte)
  def streamCommitMsg(xid: Int, lsn: Long, micros: Long): Array[Byte] = {
    val b = buf(); b.put('c'.toByte); b.putInt(xid); b.put(0.toByte)
    b.putLong(lsn); b.putLong(lsn + 8); b.putLong(micros); fin(b)
  }
  def streamAbortMsg(xid: Int, subXid: Int): Array[Byte] = {
    val b = buf(); b.put('A'.toByte); b.putInt(xid); b.putInt(subXid); fin(b)
  }
  /** Prefix an object message with the in-stream xid (v2 wire shape). */
  def streamed(xid: Int, inner: Array[Byte]): Array[Byte] = {
    val b = buf(); b.put(inner(0)); b.putInt(xid)
    b.put(inner, 1, inner.length - 1); fin(b)
  }

  /** A streamed transaction delivered as one segment per row batch:
    * S(first) rows E, S rows E, ..., Stream Commit. The commit LSN keys
    * resume filtering exactly like a plain transaction's.
    */
  def streamedTxn(commitLsn: Long, micros: Long, xid: Int,
      segments: Seq[Seq[Array[Byte]]]): FixtureTxn = {
    val payloads = segments.zipWithIndex.flatMap { case (rows, i) =>
      streamStartMsg(xid, first = i == 0) +: rows.map(streamed(xid, _)) :+ streamStopMsg()
    } :+ streamCommitMsg(xid, commitLsn, micros)
    FixtureTxn(commitLsn, payloads)
  }
}

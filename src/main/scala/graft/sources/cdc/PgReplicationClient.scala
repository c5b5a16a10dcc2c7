package graft.sources.cdc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Client half of the PostgreSQL streaming-replication protocol: the
  * network loop the reference runs inside upstream go-pq-cdc
  * (`/root/reference/connector.go:51-56` creates it; the reference's
  * README positions the slot/publication pair as the source contract).
  * Speaks `START_REPLICATION SLOT ... LOGICAL` over a `replication=
  * database` connection, demultiplexes XLogData from keepalives, and
  * carries the client's LSN feedback (standby status updates — the ACK
  * lane, ≙ `producer_batch.go:141-151`).
  *
  * Deliberately session-scoped and driver-side: one socket, one slot —
  * PostgreSQL serializes a logical slot to one consumer (the
  * reference's HA story is the same slot exclusivity, `README.md:36-42`),
  * so the parallelism lives downstream in Spark, not here. The client
  * hands raw pgoutput payloads to the caller; [[PgOutputSession]] does
  * the decode and [[ReplicationTail]] the batching/checkpointing.
  *
  * Auth: trust (AuthenticationOk), cleartext password, and
  * SCRAM-SHA-256 (the PostgreSQL default since v10; RFC 5802/7677 via
  * [[ScramSha256]], with mutual server-signature verification).
  */
final class PgReplicationClient(host: String, port: Int, user: String,
    database: String, password: Option[String] = None,
    receiveTimeoutMs: Int = 0) extends AutoCloseable {
  import PgWire._

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  // 0 = block indefinitely (a live primary keepalives every ~10s anyway);
  // tests set a bound so a protocol bug fails instead of hanging
  socket.setSoTimeout(receiveTimeoutMs)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))

  /** Last LSN the caller confirmed durable; echoed on keepalive replies. */
  @volatile var flushedLsn: Long = 0L
  private var receivedLsn: Long = 0L
  private var copyMode = false

  private def fail(body: Array[Byte]): Nothing = {
    val f = parseFields(body)
    throw new java.io.IOException(
      s"replication error ${f.getOrElse('C', "?????")}: ${f.getOrElse('M', "(no message)")}")
  }

  /** Startup handshake: `replication=database` + auth → ReadyForQuery. */
  def connect(): Unit = {
    writeStartup(out, Seq(
      "user" -> user, "database" -> database, "replication" -> "database"))
    var ready = false
    var scram: ScramSha256.Client = null
    var expectedServerSig: String = null
    def pw = password.getOrElse(throw new java.io.IOException(
      "server requests a password but none was configured"))
    while (!ready) {
      val (typ, body) = readMessage(in)
      typ match {
        case 'R' =>
          val b = java.nio.ByteBuffer.wrap(body)
          b.getInt match {
            case 0 => // AuthenticationOk
            case 3 => // cleartext password
              writeMessage(out, 'p', pw.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
            case 10 => // AuthenticationSASL: null-terminated mechanism list
              val mechs = new String(body, 4, body.length - 4, StandardCharsets.UTF_8)
                .split("\u0000").filter(_.nonEmpty).toSeq
              if (!mechs.contains(ScramSha256.Mechanism))
                throw new java.io.IOException(
                  s"server offers SASL mechanisms $mechs; only " +
                  s"${ScramSha256.Mechanism} is supported")
              val nonce = {
                val r = new Array[Byte](18)
                new java.security.SecureRandom().nextBytes(r)
                java.util.Base64.getEncoder.encodeToString(r)
              }
              scram = new ScramSha256.Client(pw, nonce)
              val initial = scram.clientFirst.getBytes(StandardCharsets.UTF_8)
              val msg = java.nio.ByteBuffer.allocate(
                ScramSha256.Mechanism.length + 1 + 4 + initial.length)
              msg.put(ScramSha256.Mechanism.getBytes(StandardCharsets.UTF_8))
                .put(0.toByte).putInt(initial.length).put(initial)
              writeMessage(out, 'p', msg.array())
            case 11 => // AuthenticationSASLContinue: server-first-message
              val serverFirst = new String(body, 4, body.length - 4, StandardCharsets.UTF_8)
              // RFC 5802 §7: a server MAY abort mid-exchange with an
              // e= attribute instead of the expected payload — surface
              // its text rather than failing on a missing r/s/i attr
              ScramSha256.attrs(serverFirst).get('e').foreach(e =>
                throw new java.io.IOException(s"SCRAM exchange failed: $e"))
              val (clientFinal, sig) = scram.respond(serverFirst)
              expectedServerSig = sig
              writeMessage(out, 'p', clientFinal.getBytes(StandardCharsets.UTF_8))
            case 12 => // AuthenticationSASLFinal: verify the SERVER too
              val serverFinal = new String(body, 4, body.length - 4, StandardCharsets.UTF_8)
              val fa = ScramSha256.attrs(serverFinal)
              fa.get('e').foreach(e =>
                throw new java.io.IOException(s"SCRAM exchange failed: $e"))
              val v = fa.getOrElse('v', "")
              if (v != expectedServerSig) throw new java.io.IOException(
                "SCRAM server signature mismatch — refusing to trust the server")
            case other => throw new java.io.IOException(
              s"unsupported authentication request $other")
          }
        case 'S' | 'K' | 'N' => // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case 'E' => fail(body)
        case other => throw new java.io.IOException(
          s"unexpected message '$other' during startup")
      }
    }
  }

  /** Run one SQL (or replication: `CREATE_REPLICATION_SLOT`, ...) command
    * through the simple-query protocol and collect its text-format result
    * rows as column-name → value maps (NULL cells are absent). A
    * `replication=database` connection accepts regular SQL too — this is
    * how the reference's engine bootstraps publications/slots and polls
    * `pg_replication_slots` for slot health.
    */
  def simpleQuery(sql: String): Seq[Map[String, String]] = {
    require(!copyMode, "simpleQuery after startReplication()")
    writeMessage(out, 'Q', sql.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
    var columns: Array[String] = Array.empty
    val rows = Seq.newBuilder[Map[String, String]]
    var err: Map[Char, String] = null
    var done = false
    while (!done) {
      val (typ, body) = readMessage(in)
      typ match {
        case 'T' => // RowDescription
          val b = java.nio.ByteBuffer.wrap(body)
          columns = Array.fill(b.getShort.toInt) {
            val start = b.position()
            while (b.get(b.position()) != 0) b.position(b.position() + 1)
            val name = new String(body, start, b.position() - start, StandardCharsets.UTF_8)
            b.position(b.position() + 1)
            b.getInt; b.getShort; b.getInt; b.getShort; b.getInt; b.getShort
            name
          }
        case 'D' => // DataRow: text-format cells in column order
          val b = java.nio.ByteBuffer.wrap(body)
          val n = b.getShort.toInt
          val row = Map.newBuilder[String, String]
          var i = 0
          while (i < n) {
            val len = b.getInt
            if (len >= 0) {
              val v = new Array[Byte](len); b.get(v)
              row += columns(i) -> new String(v, StandardCharsets.UTF_8)
            }
            i += 1
          }
          rows += row.result()
        case 'C' | 'I' | 'S' | 'N' => // CommandComplete / EmptyQuery / params
        case 'E' => err = parseFields(body) // ReadyForQuery still follows
        case 'Z' => done = true
        case other => throw new java.io.IOException(
          s"unexpected message '$other' in simple-query response")
      }
    }
    if (err != null) throw new java.io.IOException(
      s"query failed ${err.getOrElse('C', "?????")}: ${err.getOrElse('M', "(no message)")} [$sql]")
    rows.result()
  }

  /** Enter COPY-both mode from `startLsn` on `slot` with the pgoutput
    * plugin options the reference's publication setup implies
    * (`example/simple/main.go:57-81`).
    */
  def startReplication(slot: String, publication: String, startLsn: Long,
      protoVersion: Int = 1): Unit = {
    flushedLsn = startLsn
    receivedLsn = startLsn
    // proto_version 2 unlocks streamed in-progress transactions; the
    // `streaming` option asks the server to actually use them
    val streamOpt = if (protoVersion >= 2) ", streaming 'true'" else ""
    val sql = s"START_REPLICATION SLOT $slot LOGICAL ${lsnString(startLsn)} " +
      s"(proto_version '$protoVersion', publication_names '$publication'$streamOpt)"
    writeMessage(out, 'Q', sql.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
    val (typ, body) = readMessage(in)
    typ match {
      case 'W' => copyMode = true // CopyBothResponse
      case 'E' => fail(body)
      case other => throw new java.io.IOException(
        s"expected CopyBothResponse, got '$other'")
    }
  }

  /** Next XLogData frame, or None when the server ends the stream.
    * Keepalives are answered inline (current [[flushedLsn]]) when the
    * server requests a reply — the liveness contract that keeps the
    * slot from being considered abandoned.
    */
  def poll(): Option[XLogData] = {
    require(copyMode, "poll() before startReplication()")
    try {
      while (true) {
        val (typ, body) = readMessage(in)
        typ match {
          case 'd' => decodeCopyPayload(body) match {
            case x: XLogData =>
              receivedLsn = math.max(receivedLsn, x.walEnd)
              return Some(x)
            case k: Keepalive =>
              receivedLsn = math.max(receivedLsn, k.walEnd)
              if (k.replyRequested) sendStandbyStatus()
            case _: StandbyStatus => // server never sends this; ignore
          }
          case 'c' => return None // CopyDone: orderly end of stream
          case 'E' => fail(body)
          case 'C' | 'Z' | 'S' | 'N' => // command complete / ready / params
          case other => throw new java.io.IOException(
            s"unexpected message '$other' in copy mode")
        }
      }
      None
    } catch { case _: EOFException => None }
  }

  /** LSN feedback: received high-water mark + the caller-confirmed
    * flushed/applied LSN. Call [[ack]] first so `flushed` reflects only
    * sink-durable positions (ACK-after-write, `producer_batch.go:141-151`).
    */
  def sendStandbyStatus(replyRequested: Boolean = false): Unit =
    writeMessage(out, 'd', encodeStandbyStatus(StandbyStatus(
      receivedLsn, flushedLsn, flushedLsn, nowPgMicros(), replyRequested)))

  /** Mark everything up to `lsn` durably delivered and tell the server. */
  def ack(lsn: Long): Unit = {
    flushedLsn = math.max(flushedLsn, lsn)
    sendStandbyStatus()
  }

  override def close(): Unit = {
    try {
      if (!socket.isClosed) {
        try writeMessage(out, 'X', Array.empty) catch { case _: Throwable => () }
      }
    } finally socket.close()
  }

  /** Graceful shutdown from the READING thread (the tail's own loop —
    * never from a controller thread, which must use the abrupt
    * [[close]] to unblock a read): send Terminate, half-close, then
    * drain inbound until the server's EOF so the OS sends FIN rather
    * than RST. Closing with received-but-unread bytes (a trailing
    * keepalive the loop never consumed) sends RST, and an RST makes
    * the PEER discard ITS received-but-unread buffer — i.e. our final
    * standby-status acks, observed as a lost-ack flake in the
    * loopback fixture under machine load. Bounded by the 2 s timeout;
    * a walsender (and the fixture) closes promptly after Terminate.
    */
  def closeGraceful(): Unit = {
    try {
      if (!socket.isClosed) {
        try writeMessage(out, 'X', Array.empty) catch { case _: Throwable => () }
        try {
          socket.shutdownOutput()
          socket.setSoTimeout(2000)
          val buf = new Array[Byte](8192)
          while (in.read(buf) >= 0) ()
        } catch { case _: Throwable => () }
      }
    } finally socket.close()
  }
}

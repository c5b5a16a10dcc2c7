package graft.sources.cdc

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Framing for the public PostgreSQL frontend/backend protocol (v3) and
  * its streaming-replication sub-protocol — the network layer the
  * reference's ingestion loop speaks through upstream go-pq-cdc
  * (`/root/reference/connector.go:51-56`; wire format from the public
  * PostgreSQL documentation, "Frontend/Backend Protocol" and
  * "Streaming Replication Protocol").
  *
  * Regular messages are `type:1 length:4(incl. itself) body`; the
  * startup message has no type byte. Inside COPY-both mode, CopyData
  * ('d') payloads carry the replication sub-protocol: XLogData ('w'),
  * primary keepalive ('k') server→client, standby status update ('r')
  * client→server. All integers big-endian; timestamps are microseconds
  * since the PostgreSQL epoch (2000-01-01, [[PgOutput.PgEpochMicros]]).
  */
object PgWire {

  /** LSN rendered the way every PG tool prints it: `hi32/lo32` hex. */
  def lsnString(lsn: Long): String =
    f"${lsn >>> 32}%X/${lsn & 0xFFFFFFFFL}%X"

  def parseLsn(s: String): Long = s.split("/") match {
    case Array(hi, lo) => (java.lang.Long.parseLong(hi, 16) << 32) |
      java.lang.Long.parseLong(lo, 16)
    case _ => throw new IllegalArgumentException(s"bad LSN: $s")
  }

  def unixMicrosToPg(unixMicros: Long): Long = unixMicros - PgOutput.PgEpochMicros
  def nowPgMicros(): Long = unixMicrosToPg(System.currentTimeMillis() * 1000L)

  /** Read one typed backend/frontend message: (type byte, body). */
  def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val typ = in.read()
    if (typ < 0) throw new EOFException("connection closed")
    val len = in.readInt()
    require(len >= 4, s"protocol violation: message length $len")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (typ.toChar, body)
  }

  /** Write one typed message (length field covers itself + body). */
  def writeMessage(out: DataOutputStream, typ: Char, body: Array[Byte]): Unit = {
    out.writeByte(typ)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  /** The untyped startup packet: protocol 3.0 + null-terminated
    * key/value parameter pairs. A replication connection passes
    * `replication=database`.
    */
  def writeStartup(out: DataOutputStream, params: Seq[(String, String)]): Unit = {
    val b = new ByteArrayOutputStream()
    val d = new DataOutputStream(b)
    d.writeInt(196608) // protocol 3.0
    params.foreach { case (k, v) =>
      d.write(k.getBytes(StandardCharsets.UTF_8)); d.write(0)
      d.write(v.getBytes(StandardCharsets.UTF_8)); d.write(0)
    }
    d.write(0)
    out.writeInt(4 + b.size())
    b.writeTo(out)
    out.flush()
  }

  /** Parse the startup packet body (server side; fixture server). */
  def parseStartup(body: Array[Byte]): Map[String, String] = {
    val b = ByteBuffer.wrap(body)
    val proto = b.getInt
    require(proto == 196608, s"unsupported protocol $proto")
    val params = scala.collection.mutable.Map.empty[String, String]
    def cstring(): String = {
      val start = b.position()
      while (b.get(b.position()) != 0) b.position(b.position() + 1)
      val s = new String(body, start, b.position() - start, StandardCharsets.UTF_8)
      b.position(b.position() + 1)
      s
    }
    while (b.get(b.position()) != 0) params(cstring()) = cstring()
    params.toMap
  }

  /** ErrorResponse/NoticeResponse body: (field-code, value) pairs. */
  def parseFields(body: Array[Byte]): Map[Char, String] = {
    val b = ByteBuffer.wrap(body)
    val fields = scala.collection.mutable.Map.empty[Char, String]
    var code = b.get
    while (code != 0) {
      val start = b.position()
      while (b.get(b.position()) != 0) b.position(b.position() + 1)
      fields(code.toChar) =
        new String(body, start, b.position() - start, StandardCharsets.UTF_8)
      b.position(b.position() + 1)
      code = b.get
    }
    fields.toMap
  }

  /** Error/notice field list for a SQLSTATE + message (server side). */
  def fieldsBody(severity: String, sqlState: String, message: String): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    def field(code: Char, v: String): Unit = {
      b.write(code)
      b.write(v.getBytes(StandardCharsets.UTF_8)); b.write(0)
    }
    field('S', severity); field('C', sqlState); field('M', message)
    b.write(0)
    b.toByteArray
  }

  // ---- replication sub-protocol (CopyData payloads) ----

  sealed trait CopyPayload

  /** 'w' — one WAL chunk: for pgoutput, the payload is exactly one
    * logical-replication message ([[PgOutput.decode]]'s input).
    */
  final case class XLogData(walStart: Long, walEnd: Long, sendPgMicros: Long,
      payload: Array[Byte]) extends CopyPayload

  /** 'k' — primary keepalive; `replyRequested` demands an immediate
    * standby status update (the liveness probe a stalled client fails).
    */
  final case class Keepalive(walEnd: Long, sendPgMicros: Long,
      replyRequested: Boolean) extends CopyPayload

  /** 'r' — standby status update: the client's LSN feedback. The
    * `flushedLsn` is what the server may consider durably delivered —
    * the reference ACKs it only after the Kafka batch write returns
    * (`producer_batch.go:141-151`); [[ReplicationTail]] preserves
    * exactly that ordering.
    */
  final case class StandbyStatus(receivedLsn: Long, flushedLsn: Long,
      appliedLsn: Long, sendPgMicros: Long, replyRequested: Boolean)
    extends CopyPayload

  def encodeXLogData(x: XLogData): Array[Byte] = {
    val b = ByteBuffer.allocate(25 + x.payload.length)
    b.put('w'.toByte).putLong(x.walStart).putLong(x.walEnd)
      .putLong(x.sendPgMicros).put(x.payload)
    b.array()
  }

  def encodeKeepalive(k: Keepalive): Array[Byte] = {
    val b = ByteBuffer.allocate(18)
    b.put('k'.toByte).putLong(k.walEnd).putLong(k.sendPgMicros)
      .put(if (k.replyRequested) 1.toByte else 0.toByte)
    b.array()
  }

  def encodeStandbyStatus(s: StandbyStatus): Array[Byte] = {
    val b = ByteBuffer.allocate(34)
    b.put('r'.toByte).putLong(s.receivedLsn).putLong(s.flushedLsn)
      .putLong(s.appliedLsn).putLong(s.sendPgMicros)
      .put(if (s.replyRequested) 1.toByte else 0.toByte)
    b.array()
  }

  def decodeCopyPayload(body: Array[Byte]): CopyPayload = {
    val b = ByteBuffer.wrap(body)
    (b.get.toChar: @unchecked) match {
      case 'w' =>
        val (start, end, t) = (b.getLong, b.getLong, b.getLong)
        val payload = new Array[Byte](b.remaining()); b.get(payload)
        XLogData(start, end, t, payload)
      case 'k' => Keepalive(b.getLong, b.getLong, b.get == 1)
      case 'r' => StandbyStatus(b.getLong, b.getLong, b.getLong, b.getLong, b.get == 1)
      case other => throw new IllegalArgumentException(
        s"replication: unknown copy-data payload '$other'")
    }
  }
}

package graft.sources.cdc

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Decoder for the PostgreSQL `pgoutput` logical-replication output
  * plugin's binary message format (public PostgreSQL documentation,
  * "Protocol → Logical Streaming Replication → Message Formats",
  * protocol versions 1 and 2 — v2 adds streamed in-progress transactions
  * (Stream Start/Stop/Commit/Abort), the path PostgreSQL takes when a
  * transaction exceeds `logical_decoding_work_mem` — exactly the
  * huge-backfill transactions a 100 TB ingest produces. Inside a
  * Stream Start..Stop segment every object-carrying message is prefixed
  * with the subtransaction's xid; segments of different top-level
  * transactions interleave on the wire and commit/abort independently.
  * This is the wire format the reference's
  * replication slot actually speaks: upstream go-pq-cdc performs this
  * decode and the reference dispatches the resulting Insert/Update/Delete
  * messages (`connector.go:129-142`); here the decode itself is
  * re-implemented from the published format so the `graft-cdc` source can
  * ingest raw replication payloads with no PostgreSQL client library.
  *
  * All integers are network byte order; strings are null-terminated
  * UTF-8. Timestamps are microseconds since the PostgreSQL epoch
  * (2000-01-01T00:00:00Z).
  */
object PgOutput {

  /** 2000-01-01T00:00:00Z in unix microseconds — pgoutput timestamps are
    * relative to the PostgreSQL epoch, not the unix epoch.
    */
  val PgEpochMicros: Long = 946684800000000L

  sealed trait Msg

  /** 'B' — transaction start: final LSN, commit time, xid. */
  final case class Begin(finalLsn: Long, commitMicros: Long, xid: Int) extends Msg

  /** 'C' — transaction commit: flags, commit/end LSN, commit time. */
  final case class Commit(flags: Byte, commitLsn: Long, endLsn: Long,
      commitMicros: Long) extends Msg

  /** 'O' — replication origin (cascading setups); carried, not acted on. */
  final case class Origin(lsn: Long, name: String) extends Msg

  /** One column of a Relation message; `isKey` = part of the replica
    * identity (flags bit 0).
    */
  final case class Col(isKey: Boolean, name: String, typeOid: Int, typeMod: Int)

  /** 'R' — in-stream schema message: pgoutput sends the column layout of a
    * table before the first row event that uses it (and again on DDL).
    * `replicaIdentity`: 'd' default (PK), 'n' nothing, 'f' full, 'i' index.
    */
  final case class Relation(relId: Int, namespace: String, name: String,
      replicaIdentity: Char, cols: IndexedSeq[Col]) extends Msg

  /** 'Y' — user-defined type metadata; carried, not acted on. */
  final case class TypeMsg(oid: Int, namespace: String, name: String) extends Msg

  /** 'T' — truncate: affected relations + CASCADE/RESTART IDENTITY bits. */
  final case class Truncate(relIds: Seq[Int], cascade: Boolean,
      restartIdentity: Boolean) extends Msg

  /** One column value inside a TupleData. */
  sealed trait Cell
  /** 'n' — SQL NULL. */
  case object NullCell extends Cell
  /** 'u' — unchanged TOASTed value, not sent (UPDATE post-images only). */
  case object UnchangedCell extends Cell
  /** 't' — text-format value (the pgoutput default). */
  final case class TextCell(v: String) extends Cell
  /** 'b' — binary-format value (when the subscription requests binary). */
  final case class BinaryCell(v: Array[Byte]) extends Cell

  /** 'I' — INSERT: the new tuple. */
  final case class Insert(relId: Int, newTuple: IndexedSeq[Cell]) extends Msg

  /** 'U' — UPDATE: optional pre-image ('K' = replica-identity key only,
    * 'O' = full old row, absent under REPLICA IDENTITY DEFAULT when the
    * key did not change) plus the new tuple.
    */
  final case class Update(relId: Int, oldKind: Option[Char],
      oldTuple: Option[IndexedSeq[Cell]], newTuple: IndexedSeq[Cell]) extends Msg

  /** 'D' — DELETE: pre-image only; 'K' key-only (replica identity
    * DEFAULT, `README.md:237`) or 'O' full row (FULL).
    */
  final case class Delete(relId: Int, oldKind: Char,
      oldTuple: IndexedSeq[Cell]) extends Msg

  /** 'M' — `pg_logical_emit_message` payload; carried, not dispatched
    * (the reference's listener likewise sees row events only).
    */
  final case class LogicalMessage(transactional: Boolean, lsn: Long,
      prefix: String, content: Array[Byte]) extends Msg

  /** 'S' — protocol v2: opens one on-the-wire segment of a streamed
    * in-progress transaction. `firstSegment` = first segment of this xid.
    */
  final case class StreamStart(xid: Int, firstSegment: Boolean) extends Msg

  /** 'E' — protocol v2: closes the current streamed segment. */
  case object StreamStop extends Msg

  /** 'c' — protocol v2: commits a streamed transaction; only now are its
    * buffered changes durable (and only now may they be emitted).
    */
  final case class StreamCommit(xid: Int, flags: Byte, commitLsn: Long,
      endLsn: Long, commitMicros: Long) extends Msg

  /** 'A' — protocol v2: aborts a streamed (sub)transaction; `subXid ==
    * xid` aborts the whole transaction.
    */
  final case class StreamAbort(xid: Int, subXid: Int) extends Msg

  /** An object-carrying message decoded inside a streamed segment: the
    * wire prefixes it with the (sub)transaction xid it belongs to.
    */
  final case class Streamed(xid: Int, inner: Msg) extends Msg

  /** Message types that carry a leading Int32 xid when they arrive
    * inside a protocol-v2 streamed segment.
    */
  private val XidPrefixed = "RYIUDTM"

  /** Decode one pgoutput message payload (the XLogData payload of a
    * replication-stream copy-data frame). `streamedTx` = the caller is
    * inside a Stream Start..Stop segment, where object messages carry a
    * leading xid ([[PgOutputSession.decodeHere]] tracks this state).
    */
  def decode(payload: Array[Byte], streamedTx: Boolean = false): Msg = {
    val b = ByteBuffer.wrap(payload) // big-endian by default
    def cstring(): String = {
      val start = b.position()
      while (b.get(b.position()) != 0) b.position(b.position() + 1)
      val s = new String(payload, start, b.position() - start, StandardCharsets.UTF_8)
      b.position(b.position() + 1) // consume the terminator
      s
    }
    def tuple(): IndexedSeq[Cell] = {
      val n = b.getShort.toInt
      (0 until n).map { _ =>
        (b.get.toChar: @unchecked) match {
          case 'n' => NullCell
          case 'u' => UnchangedCell
          case 't' =>
            val len = b.getInt
            val v = new Array[Byte](len); b.get(v)
            TextCell(new String(v, StandardCharsets.UTF_8))
          case 'b' =>
            val len = b.getInt
            val v = new Array[Byte](len); b.get(v)
            BinaryCell(v)
          case other =>
            throw new IllegalArgumentException(
              s"pgoutput: unknown tuple-column kind '$other'")
        }
      }
    }
    def body(t: Char): Msg = (t: @unchecked) match {
      case 'B' => Begin(b.getLong, b.getLong + PgEpochMicros, b.getInt)
      case 'C' => Commit(b.get, b.getLong, b.getLong, b.getLong + PgEpochMicros)
      case 'O' => Origin(b.getLong, cstring())
      case 'Y' => TypeMsg(b.getInt, cstring(), cstring())
      case 'R' =>
        val relId = b.getInt
        val ns = cstring()
        val name = cstring()
        val ident = b.get.toChar
        val ncols = b.getShort.toInt
        val cols = (0 until ncols).map { _ =>
          Col((b.get & 1) == 1, cstring(), b.getInt, b.getInt)
        }
        // empty namespace means pg_catalog per the published format
        Relation(relId, if (ns.isEmpty) "pg_catalog" else ns, name, ident, cols)
      case 'I' =>
        val relId = b.getInt
        val kind = b.get.toChar
        require(kind == 'N', s"pgoutput INSERT: expected 'N' tuple, got '$kind'")
        Insert(relId, tuple())
      case 'U' =>
        val relId = b.getInt
        b.get.toChar match {
          case k @ ('K' | 'O') =>
            val old = tuple()
            val n = b.get.toChar
            require(n == 'N', s"pgoutput UPDATE: expected 'N' tuple, got '$n'")
            Update(relId, Some(k), Some(old), tuple())
          case 'N' => Update(relId, None, None, tuple())
          case other =>
            throw new IllegalArgumentException(
              s"pgoutput UPDATE: unknown tuple kind '$other'")
        }
      case 'D' =>
        val relId = b.getInt
        val kind = b.get.toChar
        require(kind == 'K' || kind == 'O',
          s"pgoutput DELETE: expected 'K' or 'O' tuple, got '$kind'")
        Delete(relId, kind, tuple())
      case 'T' =>
        val n = b.getInt
        val opts = b.get
        Truncate((0 until n).map(_ => b.getInt), (opts & 1) == 1, (opts & 2) == 2)
      case 'M' =>
        val flags = b.get
        val lsn = b.getLong
        val prefix = cstring()
        val len = b.getInt
        val content = new Array[Byte](len); b.get(content)
        LogicalMessage((flags & 1) == 1, lsn, prefix, content)
      case other =>
        throw new IllegalArgumentException(s"pgoutput: unknown message type '$other'")
    }
    b.get.toChar match {
      case 'S' => StreamStart(b.getInt, b.get == 1.toByte)
      case 'E' => StreamStop
      case 'c' => StreamCommit(b.getInt, b.get, b.getLong, b.getLong,
        b.getLong + PgEpochMicros)
      case 'A' => StreamAbort(b.getInt, b.getInt)
      case t if streamedTx && XidPrefixed.indexOf(t) >= 0 =>
        val xid = b.getInt
        Streamed(xid, body(t))
      case t => body(t)
    }
  }

  /** A decoded row event ready for the change-event reader: epoch-µs
    * commit time, table identity, pre/post images as name→value pairs
    * (null value = SQL NULL; unchanged-TOAST columns omitted), op string.
    */
  final case class RowEvent(eventTimeMicros: Long, tableNamespace: String,
      tableName: String, oldData: Seq[(String, String)],
      newData: Seq[(String, String)], op: String) {
    def toChangeEvent: graft.model.ChangeEvent = graft.model.ChangeEvent(
      new java.sql.Timestamp(eventTimeMicros / 1000L),
      tableNamespace, tableName,
      if (oldData == null) null else oldData.toMap,
      if (newData == null) null else newData.toMap,
      op)
  }

  /** Length-framed pgoutput replay file: each frame is a 4-byte
    * big-endian payload length followed by the raw message payload —
    * the natural capture format for a replication-slot tail (each
    * XLogData payload written verbatim).
    */
  def readFramed(in: InputStream): Iterator[Array[Byte]] = {
    val d = new DataInputStream(in)
    new Iterator[Array[Byte]] {
      private var nextPayload: Array[Byte] = advance()
      private def advance(): Array[Byte] =
        try {
          val len = d.readInt()
          val buf = new Array[Byte](len)
          d.readFully(buf)
          buf
        } catch { case _: EOFException => null }
      override def hasNext: Boolean = nextPayload != null
      override def next(): Array[Byte] = {
        val p = nextPayload; nextPayload = advance(); p
      }
    }
  }
}

/** Stateful replay of a pgoutput message stream into row events,
  * mirroring the reference's listener dispatch (`connector.go:129-142`):
  * Relation messages maintain the in-stream schema registry, Begin pins
  * the commit timestamp stamped onto every row event of the transaction,
  * Insert/Update/Delete become INSERT/UPDATE/DELETE events, and Truncate
  * becomes one TRUNCATE event per affected relation (where the reference
  * silently drops it, `connector.go:140-142` — a replica-divergence
  * hazard this session does not inherit). Replica
  * identity DEFAULT yields PK-only pre-images (the 'K' tuple — the
  * behavior the reference documents at `README.md:237`); FULL yields the
  * whole old row ('O'). Values arrive in the plugin's text format and are
  * kept as strings (the ChangeEvent dynamic-schema lane); binary cells
  * are rendered as PostgreSQL hex bytea (`\x...`).
  *
  * Protocol v2 streamed transactions are buffered per (top-level xid,
  * subtransaction xid) and emitted only at Stream Commit — stamped with
  * the commit timestamp, with Stream Abort discarding exactly the
  * aborted subtransaction's rows — so a consumer never observes an
  * uncommitted change even when segments of concurrent large
  * transactions interleave on the wire.
  *
  * One session per replay stream; not thread-safe (a partition reader
  * owns exactly one).
  */
final class PgOutputSession {
  import PgOutput._

  private val relations = mutable.Map.empty[Int, Relation]
  private var commitMicros = 0L
  // inside a Stream Start..Stop segment: that segment's top-level xid
  private var segmentXid: Option[Int] = None
  // streamed-but-uncommitted rows: top xid -> [(subtransaction xid, event)]
  private val pending =
    mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[(Int, RowEvent)]]

  private def hex(bytes: Array[Byte]): String =
    "\\x" + bytes.map(b => f"$b%02x").mkString

  /** keyOnly = a 'K' tuple: the wire carries all columns but only the
    * replica-identity ones were actually sent (the rest are padding
    * nulls) — keep just the identity columns, giving the PK-only
    * pre-image the reference documents for REPLICA IDENTITY DEFAULT.
    */
  private def render(rel: Relation, cells: IndexedSeq[Cell],
      keyOnly: Boolean = false): Seq[(String, String)] = {
    require(cells.length == rel.cols.length,
      s"pgoutput: tuple of ${cells.length} columns for relation " +
      s"${rel.namespace}.${rel.name} with ${rel.cols.length} columns — " +
      "missed a Relation (schema) message?")
    rel.cols.zip(cells).collect {
      case (c, TextCell(v)) if !keyOnly || c.isKey   => c.name -> v
      case (c, BinaryCell(v)) if !keyOnly || c.isKey => c.name -> hex(v)
      case (c, NullCell) if !keyOnly || c.isKey      => c.name -> null
      // UnchangedCell omitted: the value was not sent (TOAST)
    }
  }

  private def relation(relId: Int): Relation =
    relations.getOrElse(relId, throw new IllegalStateException(
      s"pgoutput: row event for unknown relation $relId — no Relation " +
      "message seen; a replay must start at a transaction boundary"))

  /** A row-carrying message rendered against the live schema registry,
    * stamped with `micros` (the commit time, or 0 for streamed rows
    * whose commit time is unknown until Stream Commit).
    *
    * Truncate fans out to ONE event per affected relation: PostgreSQL
    * already lists every cascaded relation in the message's relIds
    * (the CASCADE bit is advisory — honoring cascade = honoring the
    * list), so downstream table routing/filtering sees a truncation of
    * table X exactly like it sees X's row events. No row images; the
    * newData map carries the two option bits for consumers that care.
    * The reference drops this message on the floor
    * (`connector.go:140-142`) — a silent-divergence hazard for any
    * replica consumer, which is why it is surfaced here.
    */
  private def rowEvents(msg: Msg, micros: Long): Seq[RowEvent] = msg match {
    case Insert(relId, newT) =>
      val rel = relation(relId)
      Seq(RowEvent(micros, rel.namespace, rel.name,
        null, render(rel, newT), graft.model.Op.Insert))
    case Update(relId, oldKind, oldT, newT) =>
      val rel = relation(relId)
      Seq(RowEvent(micros, rel.namespace, rel.name,
        oldT.map(render(rel, _, keyOnly = oldKind.contains('K'))).orNull,
        render(rel, newT), graft.model.Op.Update))
    case Delete(relId, oldKind, oldT) =>
      val rel = relation(relId)
      Seq(RowEvent(micros, rel.namespace, rel.name,
        render(rel, oldT, keyOnly = oldKind == 'K'), null, graft.model.Op.Delete))
    case Truncate(relIds, cascade, restartIdentity) =>
      relIds.map { relId =>
        val rel = relation(relId)
        RowEvent(micros, rel.namespace, rel.name, null,
          Seq("cascade" -> cascade.toString,
            "restart_identity" -> restartIdentity.toString),
          graft.model.Op.Truncate)
      }
    case _ => Nil
  }

  /** Feed one decoded message; returns the committed row events it
    * releases (0..n for plain transactions — a Truncate fans out per
    * relation; a whole transaction's worth at a protocol-v2 Stream
    * Commit). Begin/Commit/Relation/Type/Origin/Message maintain state
    * or are carried silently; Truncate IS dispatched (one TRUNCATE
    * event per affected relation — the reference drops it,
    * `connector.go:140-142`, which silently diverges any replica
    * consumer).
    */
  def accept(msg: Msg): Seq[RowEvent] = msg match {
    case Begin(_, t, _)    => commitMicros = t; Nil
    case _: Commit         => Nil
    case r: Relation       => relations(r.relId) = r; Nil
    case _: TypeMsg        => Nil
    case _: Origin         => Nil
    case _: LogicalMessage => Nil
    case StreamStart(xid, _) =>
      require(segmentXid.isEmpty,
        s"pgoutput: Stream Start for $xid inside an open segment")
      segmentXid = Some(xid)
      pending.getOrElseUpdate(xid, mutable.ArrayBuffer.empty)
      Nil
    case StreamStop =>
      require(segmentXid.nonEmpty, "pgoutput: Stream Stop outside a segment")
      segmentXid = None; Nil
    case Streamed(subXid, inner) =>
      val top = segmentXid.getOrElse(throw new IllegalStateException(
        "pgoutput: streamed message outside a Stream Start..Stop segment"))
      inner match {
        case r: Relation => relations(r.relId) = r
        case other => rowEvents(other, 0L).foreach(ev => pending(top) += ((subXid, ev)))
      }
      Nil
    case StreamCommit(xid, _, _, _, micros) =>
      pending.remove(xid).fold(Seq.empty[RowEvent])(
        _.toSeq.map { case (_, ev) => ev.copy(eventTimeMicros = micros) })
    case StreamAbort(xid, subXid) =>
      if (subXid == xid) pending.remove(xid)
      else pending.get(xid).foreach(_.filterInPlace(_._1 != subXid))
      Nil
    case row => rowEvents(row, commitMicros)
  }

  /** Decode a raw payload under the session's current stream state:
    * inside a Stream Start..Stop segment, object messages carry a
    * leading xid that a stateless [[PgOutput.decode]] cannot know about.
    */
  def decodeHere(payload: Array[Byte]): Msg =
    decode(payload, streamedTx = segmentXid.isDefined)

  /** Decode + accept raw payload bytes. */
  def feed(payload: Array[Byte]): Seq[RowEvent] = accept(decodeHere(payload))
}

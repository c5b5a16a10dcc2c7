package graft.sources.cdc

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

import scala.collection.mutable

import graft.model.ChangeEvent

/** One committed transaction as delivered to the tail's sink: decoded
  * change events plus the raw pgoutput payloads that produced them
  * (current Relation registry first, so a capture file replays
  * standalone through a fresh [[PgOutputSession]]).
  */
final case class CommittedTxn(commitLsn: Long, endLsn: Long,
    commitMicros: Long, events: Seq[ChangeEvent], rawPayloads: Seq[Array[Byte]])

/** The reference's ingestion loop (`connector.go:129-184`) re-expressed
  * over [[PgReplicationClient]]: tail the slot, decode pgoutput frames
  * through a [[PgOutputSession]], batch row events per TRANSACTION, hand
  * each committed batch to a durable sink, and only then checkpoint +
  * send LSN feedback — at-least-once with order preserved, ACK strictly
  * after the sink write (`producer_batch.go:141-151`).
  *
  * Restart resumes from the checkpoint file's LSN: transactions acked
  * before a kill are never re-sent (no duplicates), unacked ones are
  * re-streamed (no gaps). A kill between sink write and ack re-delivers
  * that one transaction — the same at-least-once window the reference
  * has.
  *
  * The natural sink is [[ReplicationTail.captureSink]], which lands each
  * transaction as a length-framed `.pgo` file named by commit LSN —
  * lexicographic file order == LSN order — turning the live slot into
  * the existing `graft-cdc` structured-streaming lane's directory
  * contract (CdcSource.scala:33-36). Spark-side parallelism starts
  * there; this loop is deliberately single-socket because PostgreSQL
  * serializes a logical slot to one consumer (`README.md:36-42`).
  */
final class ReplicationTail(host: String, port: Int, user: String,
    database: String, password: Option[String], slot: String,
    publication: String, checkpointFile: Path, sink: CommittedTxn => Unit,
    receiveTimeoutMs: Int = 0, protoVersion: Int = 1) {
  import PgOutput._

  @volatile private var stopRequested = false
  @volatile private var activeClient: PgReplicationClient = _

  /** Ask a blocked [[run]] to exit: closes the live socket (unblocking
    * the read) and makes the loop treat the resulting error as a clean
    * end-of-stream. Safe from any thread.
    */
  def stop(): Unit = {
    stopRequested = true
    val c = activeClient
    if (c != null) c.close()
  }

  /** Confirmed-durable resume position; 0 = stream from slot start. */
  def readCheckpoint(): Long =
    if (Files.exists(checkpointFile))
      PgWire.parseLsn(new String(Files.readAllBytes(checkpointFile),
        StandardCharsets.UTF_8).trim)
    else 0L

  private def writeCheckpoint(lsn: Long): Unit = {
    val tmp = checkpointFile.resolveSibling(checkpointFile.getFileName.toString + ".tmp")
    Files.write(tmp, PgWire.lsnString(lsn).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, checkpointFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Connect, stream, and process up to `maxTransactions` commits (or
    * until the server ends the stream). Returns the final flushed LSN.
    */
  def run(maxTransactions: Int = Int.MaxValue): Long = {
    val startLsn = readCheckpoint()
    val client = new PgReplicationClient(host, port, user, database, password,
      receiveTimeoutMs)
    activeClient = client
    try {
      client.connect()
      client.startReplication(slot, publication, startLsn, protoVersion)
      val session = new PgOutputSession
      // raw Relation payloads by relId: the schema prefix each capture
      // file needs to replay standalone (PG re-sends Relation per
      // connection, a capture reader starts cold per file)
      val relations = mutable.LinkedHashMap.empty[Int, Array[Byte]]
      var txnRaw = mutable.ArrayBuffer.empty[Array[Byte]]
      var txnPrefix: Seq[Array[Byte]] = Seq.empty
      val events = mutable.ArrayBuffer.empty[ChangeEvent]
      // protocol v2: raw capture per in-progress streamed transaction
      // (segments of concurrent large transactions interleave on the
      // wire; each xid's capture replays standalone), and the top-level
      // xid of the currently open segment
      val streamRaw = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Array[Byte]]]
      var curSeg: Option[Int] = None
      var commits = 0
      var done = false
      // sink returned == durable: now (and only now) move the
      // checkpoint and feed the LSN back
      def commitTxn(txn: CommittedTxn): Unit = {
        sink(txn)
        writeCheckpoint(txn.endLsn)
        client.ack(txn.endLsn)
        commits += 1
      }
      while (!done && commits < maxTransactions && !stopRequested) {
        val polled =
          try client.poll()
          catch { case e: Throwable if stopRequested => None } // stop() closed us
        polled match {
          case None => done = true
          case Some(x) =>
            val msg = session.decodeHere(x.payload)
            msg match {
              case r: Relation =>
                relations(r.relId) = x.payload
                txnRaw += x.payload
                session.accept(msg)
              case _: Begin =>
                // schema registry as of txn start; a mid-txn Relation
                // (DDL) rides inside txnRaw in stream order
                txnPrefix = relations.values.toSeq
                txnRaw = mutable.ArrayBuffer(x.payload)
                events.clear()
                session.accept(msg)
              case c: Commit =>
                txnRaw += x.payload
                session.accept(msg)
                commitTxn(CommittedTxn(c.commitLsn, c.endLsn, c.commitMicros,
                  events.toSeq, txnPrefix ++ txnRaw.toSeq))
                txnRaw = mutable.ArrayBuffer.empty
              case s @ StreamStart(xid, _) =>
                session.accept(s)
                curSeg = Some(xid)
                // first segment seeds the capture with the schema prefix
                streamRaw.getOrElseUpdate(xid,
                  mutable.ArrayBuffer(relations.values.toSeq: _*)) += x.payload
              case StreamStop =>
                session.accept(msg)
                curSeg.foreach(xid => streamRaw(xid) += x.payload)
                curSeg = None
              case c: StreamCommit =>
                val evs = session.accept(msg).map(_.toChangeEvent)
                val raw = streamRaw.remove(c.xid).map(_.toSeq).getOrElse(Seq.empty)
                commitTxn(CommittedTxn(c.commitLsn, c.endLsn, c.commitMicros,
                  evs, raw :+ x.payload))
              case a: StreamAbort =>
                session.accept(msg)
                if (a.subXid == a.xid) streamRaw.remove(a.xid)
                else streamRaw.get(a.xid).foreach(_ += x.payload)
              case st: Streamed =>
                // rows buffer session-side until Stream Commit; the raw
                // payload rides in its transaction's capture
                session.accept(st)
                curSeg.foreach(xid => streamRaw(xid) += x.payload)
              case other =>
                txnRaw += x.payload
                session.accept(other).foreach(ev => events += ev.toChangeEvent)
            }
        }
      }
      client.flushedLsn
      // graceful: this IS the reading thread, so the half-close +
      // inbound drain cannot race the poll loop (stop() keeps using
      // the abrupt close() to unblock a blocked read; closeGraceful
      // then no-ops on the already-closed socket)
    } finally client.closeGraceful()
  }
}

object ReplicationTail {

  /** Build from the YAML-loaded connector config — the reference's
    * `cdc.host`/`username`/`password`/`database` plus the slot and
    * publication names (`README.md:223-247`).
    */
  def fromConfig(cfg: graft.app.ConnectorConfig, checkpointFile: Path,
      sink: CommittedTxn => Unit, receiveTimeoutMs: Int = 0,
      protoVersion: Int = 1): ReplicationTail = {
    val pg = cfg.postgres
    require(pg.host.nonEmpty && pg.database.nonEmpty,
      "replication lane needs cdc.host and cdc.database")
    new ReplicationTail(pg.host, pg.port, pg.username, pg.database,
      Option(pg.password).filter(_.nonEmpty), cfg.slotName,
      pg.publicationName, checkpointFile, sink, receiveTimeoutMs, protoVersion)
  }

  /** Sink landing each committed transaction as one length-framed `.pgo`
    * capture file named by zero-padded commit LSN (lexicographic ==
    * commit order, the `graft-cdc` directory contract). Written to a
    * temp name and atomically moved, so a concurrent streaming reader
    * never lists a partial file.
    */
  def captureSink(dir: Path): CommittedTxn => Unit = {
    Files.createDirectories(dir)
    txn => {
      val tmp = dir.resolve(f".${txn.commitLsn}%016x.pgo.tmp")
      val out = new DataOutputStream(new BufferedOutputStream(Files.newOutputStream(tmp)))
      try {
        txn.rawPayloads.foreach { p => out.writeInt(p.length); out.write(p) }
      } finally out.close()
      Files.move(tmp, dir.resolve(f"${txn.commitLsn}%016x.pgo"),
        StandardCopyOption.ATOMIC_MOVE)
    }
  }
}

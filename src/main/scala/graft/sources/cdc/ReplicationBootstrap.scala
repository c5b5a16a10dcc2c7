package graft.sources.cdc

import graft.app.{PostgresSourceConfig, PublicationTable}

/** Startup bootstrap for the live replication lane — the reference's
  * publication/slot `CreateIfNotExists` contract
  * (`/root/reference/README.md:230-239`, `example/simple/main.go:57-84`):
  * ensure the publication exists (creating it with the configured
  * operations and setting each table's replica identity when allowed),
  * then ensure the logical slot exists (creating it with the pgoutput
  * plugin when allowed). A missing object without its create flag is a
  * loud startup error, exactly the reference's
  * "publication is not exists" / "replication slot is not exists".
  *
  * All SQL is against public PostgreSQL catalogs (`pg_publication`,
  * `pg_replication_slots`) plus the public replication command
  * `CREATE_REPLICATION_SLOT ... LOGICAL pgoutput` — a
  * `replication=database` connection accepts both.
  */
object ReplicationBootstrap {

  /** One `pg_replication_slots` observation (text-format row decoded):
    * what the slot-health monitor publishes each tick.
    */
  final case class SlotInfo(
      active: Boolean,
      activePid: Option[Int],
      confirmedFlushLsn: Long,
      restartLsn: Long,
      currentWalLsn: Long) {
    /** WAL bytes the server retains for this slot (restart_lsn back). */
    def retainedWalBytes: Long = math.max(currentWalLsn - restartLsn, 0L)
    /** WAL bytes not yet confirmed by the consumer — the slot lag. */
    def lagBytes: Long = math.max(currentWalLsn - confirmedFlushLsn, 0L)
  }

  /** Run the full bootstrap over an already-connected client. */
  def run(client: PgReplicationClient, pg: PostgresSourceConfig,
      slotName: String): Unit = {
    ensurePublication(client, pg)
    ensureSlot(client, slotName, pg.slotCreateIfNotExists)
  }

  /** Publication half: probe `pg_publication`; create (+ set replica
    * identities) when absent and allowed, fail loudly when absent and
    * not allowed. Replica identity is applied on CREATE only — an
    * existing publication is the operator's contract, not ours to alter
    * (the reference likewise only creates, never reconciles).
    */
  def ensurePublication(client: PgReplicationClient,
      pg: PostgresSourceConfig): Unit = {
    val name = pg.publicationName
    val exists = client.simpleQuery(
      s"SELECT pubname FROM pg_publication WHERE pubname = '$name'").nonEmpty
    if (exists) return
    if (!pg.publicationCreateIfNotExists)
      throw new java.io.IOException(
        s"publication \"$name\" does not exist and " +
        "publication.createIfNotExists is false")
    require(pg.publicationTables.nonEmpty,
      "publication.createIfNotExists needs publication.tables")
    pg.publicationTables
      .filter(_.replicaIdentity == PublicationTable.IdentityFull)
      .foreach { t =>
        client.simpleQuery(s"ALTER TABLE ${t.qualified} REPLICA IDENTITY FULL")
      }
    val publish = pg.publicationOperations.map(_.toLowerCase).mkString(", ")
    val tables = pg.publicationTables.map(_.qualified).mkString(", ")
    client.simpleQuery(
      s"CREATE PUBLICATION $name FOR TABLE $tables WITH (publish = '$publish')")
  }

  /** Slot half: probe `pg_replication_slots`; create via the replication
    * command when absent and allowed, fail loudly otherwise.
    */
  def ensureSlot(client: PgReplicationClient, slotName: String,
      createIfNotExists: Boolean): Unit = {
    val exists = client.simpleQuery(
      "SELECT slot_name FROM pg_replication_slots " +
      s"WHERE slot_name = '$slotName'").nonEmpty
    if (exists) return
    if (!createIfNotExists)
      throw new java.io.IOException(
        s"replication slot \"$slotName\" does not exist and " +
        "slot.createIfNotExists is false")
    client.simpleQuery(s"CREATE_REPLICATION_SLOT $slotName LOGICAL pgoutput")
  }

  /** One slot-health observation, or None when the slot is gone. */
  def slotInfo(client: PgReplicationClient, slotName: String): Option[SlotInfo] =
    client.simpleQuery(
      "SELECT active, active_pid, confirmed_flush_lsn, restart_lsn, " +
      "pg_current_wal_lsn() AS current_lsn FROM pg_replication_slots " +
      s"WHERE slot_name = '$slotName'").headOption.map { r =>
      def lsn(col: String): Long =
        r.get(col).map(PgWire.parseLsn).getOrElse(0L)
      SlotInfo(
        active = r.get("active").contains("t"),
        activePid = r.get("active_pid").map(_.toInt),
        confirmedFlushLsn = lsn("confirmed_flush_lsn"),
        restartLsn = lsn("restart_lsn"),
        currentWalLsn = lsn("current_lsn"))
    }
}

/** The reference engine's slot activity checker re-expressed: a paced
  * monitor polling `pg_replication_slots` on its own connection
  * (`cdc.slot.slotActivityCheckerInterval`, reference default 1000 ms)
  * and handing each observation — `None` when the slot has been dropped,
  * the fatal condition the reference alarms on — to `onInfo`. The
  * connection is rebuilt on error (a monitor must outlive network
  * blips); polling stops with [[close]].
  */
final class SlotActivityChecker(
    mkClient: () => PgReplicationClient,
    slotName: String,
    intervalMs: Long,
    onInfo: Option[ReplicationBootstrap.SlotInfo] => Unit) extends AutoCloseable {

  @volatile private var stopped = false
  private var client: PgReplicationClient = null

  private val thread = new Thread(() => {
    while (!stopped) {
      try {
        if (client == null) { client = mkClient(); client.connect() }
        onInfo(ReplicationBootstrap.slotInfo(client, slotName))
      } catch {
        case _: Throwable if stopped => // closed under us: exiting
        case _: Throwable =>
          if (client != null) { try client.close() catch { case _: Throwable => () } }
          client = null // transient: reconnect next tick
      }
      if (!stopped)
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () } // close() waking us
    }
    if (client != null) { try client.close() catch { case _: Throwable => () } }
  }, s"graft-slot-activity-$slotName")
  thread.setDaemon(true)

  def start(): Unit = thread.start()

  override def close(): Unit = {
    stopped = true
    thread.interrupt()
    thread.join(5000L)
  }
}

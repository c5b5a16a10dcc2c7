package graft.sources.cdc

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.app.{PostgresSourceConfig, PublicationTable}

/** The reference's publication/slot bootstrap contract
  * (`/root/reference/README.md:230-239`) and the slot activity checker,
  * driven against the loopback fixture server's catalog knobs.
  */
class ReplicationBootstrapSpec extends SparkSpec {
  import PgOutputFixtures._

  private val rel = relationMsg(1, "public", "users", 'd',
    Seq(true -> "id", false -> "name"))

  private def metricValue(body: String, name: String): Double =
    body.linesIterator.find(_.startsWith(name + "{"))
      .map(_.split(" ").last.toDouble)
      .getOrElse(fail(s"metric $name not rendered"))

  private def connect(port: Int): PgReplicationClient = {
    val c = new PgReplicationClient("127.0.0.1", port, "graft", "db",
      receiveTimeoutMs = 15000)
    c.connect()
    c
  }

  private def pgCfg(create: Boolean) = PostgresSourceConfig(
    host = "127.0.0.1", username = "graft", database = "db",
    publicationName = "cdc_publication",
    publicationCreateIfNotExists = create,
    publicationOperations = Seq("INSERT", "UPDATE", "DELETE"),
    publicationTables = Seq(
      PublicationTable("users", replicaIdentity = PublicationTable.IdentityFull),
      PublicationTable("books", schema = "inventory")),
    slotCreateIfNotExists = create)

  test("bootstrap creates publication (+ FULL replica identity) and slot when absent and allowed") {
    val server = new ReplicationFixtureServer(Seq(rel), Seq.empty)
    server.publicationExists = false
    server.slotExists = false
    try {
      val c = connect(server.port)
      try ReplicationBootstrap.run(c, pgCfg(create = true), "cdc_slot")
      finally c.close()
      val ddl = server.executedDdl.asScala.toSeq
      // FULL tables get their identity set; DEFAULT tables are left alone
      assert(ddl.contains("ALTER TABLE public.users REPLICA IDENTITY FULL"))
      assert(!ddl.exists(_.contains("inventory.books REPLICA IDENTITY")))
      assert(ddl.contains("CREATE PUBLICATION cdc_publication FOR TABLE " +
        "public.users, inventory.books WITH (publish = 'insert, update, delete')"))
      assert(ddl.contains("CREATE_REPLICATION_SLOT cdc_slot LOGICAL pgoutput"))
      // the server's state transitioned: a re-run is a no-op
      server.executedDdl.clear()
      val c2 = connect(server.port)
      try ReplicationBootstrap.run(c2, pgCfg(create = true), "cdc_slot")
      finally c2.close()
      assert(server.executedDdl.isEmpty)
    } finally server.stop()
  }

  test("bootstrap is a no-op against an already-provisioned primary") {
    val server = new ReplicationFixtureServer(Seq(rel), Seq.empty)
    try {
      val c = connect(server.port)
      try ReplicationBootstrap.run(c, pgCfg(create = false), "cdc_slot")
      finally c.close()
      assert(server.executedDdl.isEmpty)
    } finally server.stop()
  }

  test("missing publication or slot without its create flag fails loudly (reference error parity)") {
    val server = new ReplicationFixtureServer(Seq(rel), Seq.empty)
    server.publicationExists = false
    try {
      val c = connect(server.port)
      try {
        val e = intercept[java.io.IOException] {
          ReplicationBootstrap.run(c, pgCfg(create = false), "cdc_slot")
        }
        assert(e.getMessage.contains("publication \"cdc_publication\" does not exist"))
      } finally c.close()
      server.publicationExists = true
      server.slotExists = false
      val c2 = connect(server.port)
      try {
        val e = intercept[java.io.IOException] {
          ReplicationBootstrap.run(c2, pgCfg(create = false), "cdc_slot")
        }
        assert(e.getMessage.contains("replication slot \"cdc_slot\" does not exist"))
      } finally c2.close()
    } finally server.stop()
  }

  test("slot activity checker publishes slot health each tick and detects a dropped slot") {
    val server = new ReplicationFixtureServer(Seq(rel), Seq.empty)
    server.slotActive = true
    try {
      val registry = new graft.streaming.MetricsRegistry("chk-slot")
      val observed = new java.util.concurrent.ConcurrentLinkedQueue[
        Option[ReplicationBootstrap.SlotInfo]]
      val checker = new SlotActivityChecker(
        () => new PgReplicationClient("127.0.0.1", server.port, "graft", "db",
          receiveTimeoutMs = 15000),
        "cdc_slot", intervalMs = 100L,
        info => { observed.add(info); registry.setSlotInfo(info) })
      checker.start()
      try {
        val deadline = System.currentTimeMillis() + 15000
        while (observed.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        val first = observed.peek()
        assert(first.isDefined, "checker never observed the slot")
        val s = first.get
        assert(s.active && s.activePid.contains(4242))
        assert(s.confirmedFlushLsn == 0x100L && s.currentWalLsn == 0x400L)
        assert(s.lagBytes == 0x300L && s.retainedWalBytes == 0x380L)
        val body = registry.render
        assert(metricValue(body, "graft_cdc_slot_activity") == 1.0)
        assert(metricValue(body, "graft_cdc_slot_lag") == 0x300L.toDouble)
        assert(metricValue(body, "graft_cdc_slot_retained_walsize") == 0x380L.toDouble)
        assert(metricValue(body, "graft_cdc_slot_confirmed_flush_lsn") == 0x100L.toDouble)
        assert(metricValue(body, "graft_cdc_slot_dropped") == 0.0)

        // drop the slot: the checker must surface it (the reference's
        // slot checker alarms on exactly this)
        server.slotExists = false
        while (!registry.slotIsDropped && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(registry.slotIsDropped, "dropped slot never detected")
        assert(metricValue(registry.render, "graft_cdc_slot_dropped") == 1.0)
      } finally checker.close()
    } finally server.stop()
  }

  test("Connector.start bootstraps the live lane: missing slot without the flag aborts startup") {
    val server = new ReplicationFixtureServer(Seq(rel), Seq.empty)
    server.slotExists = false
    try {
      val dir = java.nio.file.Files.createTempDirectory("boot_conn")
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
           |kafka:
           |  tableTopicMapping:
           |    public.users: users-topic
           |  brokers: [unused:9092]
           |""".stripMargin)
      val conn = new graft.app.Connector(spark, cfg, sink = "parquet",
        parquetOutDir = dir.resolve("out").toString)
      try {
        val e = intercept[java.io.IOException] { conn.start() }
        assert(e.getMessage.contains("replication slot \"cdc_slot\" does not exist"))
      } finally conn.close()
    } finally server.stop()
  }
}

package graft.app

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import graft.SparkSpec

/** The "switch from the reference" path, end-to-end in one test: a
  * reference-shaped YAML config file boots the connector, the CDC stream
  * materializes into the queryable replica, the Prometheus endpoint
  * serves while it runs, and a restart resumes from the checkpoint —
  * every piece a migrating go-pq-cdc-kafka user touches, wired together
  * the way they would wire it.
  */
class MigrationE2eSpec extends SparkSpec {

  private def scrape(port: Int, path: String): (Int, String) = {
    val c = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(5000); c.setReadTimeout(5000)
    val code = c.getResponseCode
    val body = scala.io.Source.fromInputStream(c.getInputStream).mkString
    c.disconnect()
    (code, body)
  }

  test("yaml config -> connector -> replica -> metrics -> restart resume") {
    val src = Files.createTempDirectory("graft-mig-src")
    val chk = Files.createTempDirectory("graft-mig-chk")
    val tbl = Files.createTempDirectory("graft-mig-tbl").toString + "/t"

    val cfg = ConfigLoader.fromYaml(
      s"""cdc:
         |  publication:
         |    name: cdc_publication
         |    tables:
         |      - name: users
         |  slot:
         |    name: migration_slot
         |  metric:
         |    port: 0
         |kafka:
         |  brokers: [unused:9092]
         |  tableTopicMapping:
         |    public.users: cdc.public.users
         |  producerBatchTickerDuration: 250ms
         |source:
         |  dir: ${src}
         |  checkpointDir: ${chk}
         |  keyField: id
         |replica:
         |  nBuckets: 4
         |""".stripMargin)
    assert(cfg.slotName == "migration_slot")

    def row(op: String, id: Int, sec: Int, v: String) = {
      val data = s"""{"id":"$id","v":"$v"}"""
      val (o, n) = if (op == "DELETE") (data, "null") else ("null", data)
      s"""{"eventTime":"2024-01-01T00:00:${"%02d".format(sec)}.000Z","tableNamespace":"public","tableName":"users","oldData":$o,"newData":$n,"op":"$op"}"""
    }
    Files.write(src.resolve("b1.json"),
      (1 to 8).map(i => row("INSERT", i, i, s"v$i")).mkString("\n").getBytes)

    val conn = new Connector(spark, cfg, sink = "replica", parquetOutDir = tbl)
    val q = conn.start()
    q.processAllAvailable()
    // replica queryable while the stream runs
    assert(graft.streaming.Materialize.replica(spark, tbl).count() == 8)
    // metrics endpoint serves the reference's surface
    val port = conn.metricsPort.get
    val (mc, metrics) = scrape(port, "/metrics")
    assert(mc == 200 && metrics.contains("graft_cdc_write_total"))
    val (sc, status) = scrape(port, "/status")
    assert(sc == 200 && status == "OK")
    assert(metrics.contains("migration_slot")) // slot rides the metric labels
    conn.close()

    // changes arrive while down; a fresh connector resumes, no loss/dup
    Files.write(src.resolve("b2.json"),
      Seq(row("UPDATE", 1, 30, "v1b"), row("DELETE", 2, 31, "")).mkString("\n").getBytes)
    val conn2 = new Connector(spark, cfg, sink = "replica", parquetOutDir = tbl)
    conn2.start().processAllAvailable()
    conn2.close()
    val state = graft.streaming.Materialize.replica(spark, tbl).collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1)("v")).toMap
    assert(state.size == 7 && state("1") == "v1b" && !state.contains("2"))
    // the serving path: bucket-pruned point lookup
    assert(graft.streaming.Materialize.lookup(spark, tbl, "3", nBuckets = 4)
      .collect().head.getMap[String, String](1)("v") == "v3")

    // migration ACCEPTANCE (the q115 operator): order-insensitive
    // per-bucket checksum of the replica equals the checksum of the
    // independently-constructed expected state — cutover proven, not
    // eyeballed
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def sums(df: org.apache.spark.sql.DataFrame) =
      graft.queries.Validation.checksum(df,
          col("id").cast("long") % 4,
          concat_ws("|", col("id"), col("v")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val replicaFlat = graft.streaming.Materialize.replica(spark, tbl)
      .select(col("k").as("id"), col("data")("v").as("v"))
    val expected = ((3 to 8).map(i => (s"$i", s"v$i")) :+ ("1", "v1b"))
      .toDF("id", "v")
    assert(sums(replicaFlat) == sums(expected))
  }
}

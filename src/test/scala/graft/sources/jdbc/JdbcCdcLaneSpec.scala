package graft.sources.jdbc

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The database-reading lane, driven against embedded Derby: partitioned
  * JDBC snapshot, changelog poll CDC, the gapless snapshot→CDC handoff,
  * admission control, pushdown, and checkpoint resume. Mirrors the
  * reference's snapshot integration test
  * (`integration_test/snapshot_test.go:24-163`: seed rows → snapshot →
  * further writes → CDC captures exactly the rest).
  */
class JdbcCdcLaneSpec extends SparkSpec {

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE books (
        |  id INT PRIMARY KEY, title VARCHAR(100), author VARCHAR(100))""".stripMargin)
    st.execute(
      """CREATE TABLE changelog (
        |  change_id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        |  event_time TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
        |  table_namespace VARCHAR(32) DEFAULT 'public',
        |  table_name VARCHAR(64),
        |  op VARCHAR(16),
        |  old_data VARCHAR(4000),
        |  new_data VARCHAR(4000))""".stripMargin)
    st.close(); conn.close()
    url
  }

  /** Application write + its changelog entry — what a trigger (or the
    * outbox pattern) maintains in a real deployment.
    */
  private def insertBook(url: String, id: Int, title: String, author: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement("INSERT INTO books VALUES (?, ?, ?)")
      ps.setInt(1, id); ps.setString(2, title); ps.setString(3, author)
      ps.executeUpdate(); ps.close()
      val cl = conn.prepareStatement(
        "INSERT INTO changelog (table_name, op, new_data) VALUES ('books', 'INSERT', ?)")
      cl.setString(1, s"""{"id":"$id","title":"$title","author":"$author"}""")
      cl.executeUpdate(); cl.close()
    } finally conn.close()
  }

  private def updateBook(url: String, id: Int, title: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val old = {
        val rs = conn.createStatement().executeQuery(s"SELECT title FROM books WHERE id = $id")
        rs.next(); rs.getString(1)
      }
      val ps = conn.prepareStatement("UPDATE books SET title = ? WHERE id = ?")
      ps.setString(1, title); ps.setInt(2, id)
      ps.executeUpdate(); ps.close()
      val cl = conn.prepareStatement(
        "INSERT INTO changelog (table_name, op, old_data, new_data) VALUES ('books', 'UPDATE', ?, ?)")
      cl.setString(1, s"""{"id":"$id","title":"$old"}""")
      cl.setString(2, s"""{"id":"$id","title":"$title"}""")
      cl.executeUpdate(); cl.close()
    } finally conn.close()
  }

  private def deleteBook(url: String, id: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val old = {
        val rs = conn.createStatement().executeQuery(s"SELECT title FROM books WHERE id = $id")
        rs.next(); rs.getString(1)
      }
      conn.createStatement().executeUpdate(s"DELETE FROM books WHERE id = $id")
      val cl = conn.prepareStatement(
        "INSERT INTO changelog (table_name, op, old_data) VALUES ('books', 'DELETE', ?)")
      cl.setString(1, s"""{"id":"$id","title":"$old"}""")
      cl.executeUpdate(); cl.close()
    } finally conn.close()
  }

  private def ids(df: DataFrame): Set[Int] =
    df.select(element_at(col("newData"), "id").cast("int")).collect().map(_.getInt(0)).toSet

  test("partitioned JDBC snapshot: chunked scan surfaces SNAPSHOT events") {
    val url = freshDb("snapdb")
    (1 to 50).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))

    val snap = JdbcSnapshot.snapshot(spark, url, "books",
      partitionColumn = "id", lowerBound = 1, upperBound = 50, numPartitions = 4)
    assert(snap.rdd.getNumPartitions == 4) // chunk ↦ JDBC partition
    val rows = snap.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[String]("op") == "SNAPSHOT"))
    assert(rows.forall(_.getAs[String]("tableName") == "books"))
    assert(ids(snap) == (1 to 50).toSet)
    val m = snap.filter(element_at(col("newData"), "id") === "7").collect()(0)
      .getAs[Map[String, String]]("newData")
    assert(m("title") == "Book 7" && m("author") == "Author 7")
  }

  test("ensureChangelog auto-creates the log table once (CreateIfNotExists analog)") {
    val url = "jdbc:derby:memory:ensuredb;create=true"
    DriverManager.getConnection(url).close() // db without any tables
    assert(JdbcSnapshot.ensureChangelog(url))   // created
    assert(!JdbcSnapshot.ensureChangelog(url))  // idempotent
    // and the lane works against the auto-created table
    val conn = DriverManager.getConnection(url)
    val ps = conn.prepareStatement(
      "INSERT INTO changelog (table_name, op, new_data) VALUES ('books', 'INSERT', ?)")
    ps.setString(1, """{"id":"1"}"""); ps.executeUpdate(); ps.close(); conn.close()
    assert(JdbcSnapshot.changesBatch(spark, url, fromCursor = 0).count() == 1)
  }

  test("chunkSize maps to JDBC partitions (reference ChunkSize knob)") {
    val url = freshDb("chunkdb")
    (1 to 50).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))
    val snap = JdbcSnapshot.snapshotChunked(spark, url, "books",
      partitionColumn = "id", lowerBound = 1, upperBound = 50, chunkSize = 15)
    assert(snap.rdd.getNumPartitions == 4) // ceil(50/15)
    assert(snap.count() == 50)
  }

  test("gapless snapshot -> CDC handoff: no gap, no dup across the boundary") {
    val url = freshDb("handoffdb")
    (1 to 50).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))

    // snapshot phase: watermark BEFORE the scan
    val (watermark, snap) = JdbcSnapshot.snapshotWithWatermark(
      spark, url, "books", "id", 1, 50, 4)
    val snapIds = ids(snap)
    assert(snapIds == (1 to 50).toSet)

    // post-snapshot writes (what CDC must deliver) — all three ops
    (51 to 70).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))
    (1 to 5).foreach(i => updateBook(url, i, s"Book $i rev2"))
    (48 to 50).foreach(deleteBook(url, _))

    val cdc = JdbcSnapshot.changesBatch(spark, url, fromCursor = watermark)
    val cdcRows = cdc.collect()
    assert(cdcRows.length == 28) // exactly the post-watermark changes — no dup of the 50
    val cdcInsertIds = ids(cdc.filter(col("op") === "INSERT"))
    assert(cdcInsertIds == (51 to 70).toSet)       // no gap
    assert(cdcInsertIds.intersect(snapIds).isEmpty) // no dup
    val updates = cdc.filter(col("op") === "UPDATE").collect()
    assert(updates.length == 5)
    assert(updates.forall(r => r.getAs[Map[String, String]]("oldData") != null))
    // DELETE: pre-image only, no post-image (pgoutput's delete shape)
    val deletes = cdc.filter(col("op") === "DELETE").collect()
    assert(deletes.length == 3)
    assert(deletes.forall(r => r.getAs[Map[String, String]]("oldData") != null &&
      r.getAs[Map[String, String]]("newData") == null))
    assert(deletes.map(_.getAs[Map[String, String]]("oldData")("id").toInt).toSet
      == (48 to 50).toSet)

    // applied state == final database state (the reference test's check):
    // latest event per key, deletes drop the key
    val applied = snap.unionAll(cdc)
      .withColumn("id", coalesce(
        element_at(col("newData"), "id"), element_at(col("oldData"), "id")).cast("int"))
      .groupBy(col("id"))
      .agg(max_by(col("op"), col("eventTime")).as("last_op"))
      .filter(col("last_op") =!= "DELETE")
    assert(applied.count() == 67) // 70 live rows minus the 3 deletes
  }

  test("streaming poll with admission control: exactly-once across capped micro-batches") {
    val url = freshDb("streamdb")
    (1 to 25).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))

    val stream = JdbcSnapshot.resumeStream(spark, url, fromCursor = 0,
      numPartitions = 2, maxRowsPerBatch = 7)
    val q = stream.writeStream.format("memory").queryName("jdbc_cdc_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM jdbc_cdc_mem")
      assert(ids(got) == (1 to 25).toSet)
      assert(got.count() == 25) // once each, despite multiple batches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4, // ceil(25/7): the cap actually split the poll
        s"expected >=4 capped batches, saw ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.forall(_.numInputRows <= 7))
    } finally q.stop()
  }

  test("checkpoint resume: restart continues strictly after the last ACK'd cursor") {
    val url = freshDb("resumedb")
    val ckpt = Files.createTempDirectory("jdbc_cdc_ckpt").toString
    val out = Files.createTempDirectory("jdbc_cdc_out").toString
    (1 to 10).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))

    def runOnce(): Unit = {
      val q = JdbcSnapshot.resumeStream(spark, url, fromCursor = 0)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 10)
    (11 to 20).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 20) // the first 10 were not re-delivered
    assert(ids(all) == (1 to 20).toSet)
  }

  test("publication filters are pushed into the database poll query") {
    val url = freshDb("pushdb")
    (1 to 10).foreach(i => insertBook(url, i, s"Book $i", s"Author $i"))
    (1 to 3).foreach(i => updateBook(url, i, s"Book $i rev2"))

    val onlyInserts = JdbcSnapshot.changesBatch(spark, url, fromCursor = 0)
      .filter(col("op") === "INSERT")
    assert(onlyInserts.count() == 10)
    // the filter reaches the SQL poll, not just a Spark-side residual
    val planned = onlyInserts.queryExecution.executedPlan.toString()
    assert(planned.contains("pushed=[") && planned.contains("EqualTo(op,INSERT)"),
      s"op filter not pushed into scan:\n$planned")
  }
}

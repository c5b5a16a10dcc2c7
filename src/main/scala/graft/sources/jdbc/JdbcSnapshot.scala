package graft.sources.jdbc

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.SnapshotSource

/** JDBC snapshot lane — SURVEY §2A S2's "chunk ↦ JDBC partition" mapping
  * made executable (reference `example/snapshot/main.go:90-98`: chunked
  * snapshot of existing rows before CDC; `README.md:242-248`): a
  * partitioned `spark.read.jdbc` scan surfaced as SNAPSHOT change
  * events. Each JDBC partition is one "chunk", claimed by a Spark task
  * and retried on failure — the reference's chunk-claim/heartbeat/resume
  * bookkeeping collapses into task scheduling.
  *
  * Gapless handoff (`README.md:65-70` "Consistent Point"/"No Gaps"): the
  * changelog cursor is read BEFORE the snapshot scan starts
  * ([[snapshotWithWatermark]]), and the CDC poll starts from that
  * watermark. Every change committed before the watermark is in the
  * snapshot; every change after it is delivered by CDC. A write that
  * lands between the watermark read and the snapshot read appears in
  * both (the snapshot sees it, and its cursor is past the watermark) —
  * at-least-once at the boundary, which downstream latest-by-key
  * semantics (q15/q46 CDC-apply) collapse exactly; the reference's
  * `pg_export_snapshot` transaction removes even that overlap, which a
  * plain JDBC connection cannot express.
  */
object JdbcSnapshot {

  /** Partitioned snapshot of one table as SNAPSHOT ChangeEvents.
    * `partitionColumn/lowerBound/upperBound/numPartitions` are the chunk
    * knobs (≙ reference `ChunkSize`): Spark issues one range query per
    * partition. Column names are lowercased to match the pgoutput
    * relation-name convention the other lanes use.
    */
  def snapshot(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      namespace: String = "public"): DataFrame = {
    val df = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
    val lowered = df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase): _*)
    SnapshotSource.asSnapshotEvents(lowered, table.toLowerCase, namespace)
  }

  /** Create the changelog table if it does not exist — the analog of the
    * reference auto-creating its replication infrastructure
    * (`CreateIfNotExists: true` on the slot,
    * `example/snapshot/main.go:86-88`; publications likewise). ANSI
    * identity-column DDL (valid on Derby and PostgreSQL 10+). Returns
    * true when this call created the table.
    */
  def ensureChangelog(url: String, changelog: String = "changelog"): Boolean = {
    require(changelog.matches("[A-Za-z0-9_]+"), s"illegal changelog table name: $changelog")
    val conn = DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      // Derby stores unquoted identifiers upper-case, PostgreSQL lower-case
      val exists = Seq(changelog.toUpperCase, changelog.toLowerCase).exists { n =>
        val rs = md.getTables(null, null, n, Array("TABLE"))
        try rs.next() finally rs.close()
      }
      if (!exists) {
        conn.createStatement().execute(
          s"""CREATE TABLE $changelog (
             |  change_id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
             |  event_time TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
             |  table_namespace VARCHAR(64) DEFAULT 'public',
             |  table_name VARCHAR(128),
             |  op VARCHAR(16),
             |  old_data VARCHAR(8000),
             |  new_data VARCHAR(8000))""".stripMargin)
      }
      !exists
    } finally conn.close()
  }

  /** Chunk-size flavor of [[snapshot]] — the reference's knob verbatim
    * (`SnapshotConfig.ChunkSize`, `example/snapshot/main.go:93`: "process
    * N rows per chunk"): one JDBC partition per `chunkSize` ids of the
    * key span.
    */
  def snapshotChunked(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      chunkSize: Int,
      namespace: String = "public"): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val span = upperBound - lowerBound + 1
    val parts = math.max(1L, (span + chunkSize - 1) / chunkSize).toInt
    snapshot(spark, url, table, partitionColumn, lowerBound, upperBound, parts, namespace)
  }

  /** Current changelog cursor — the consistent-point stand-in for
    * `pg_export_snapshot()`: CDC resumes strictly after this value.
    */
  def currentCursor(url: String, changelog: String = "changelog"): Long = {
    require(changelog.matches("[A-Za-z0-9_.]+"), s"illegal changelog table name: $changelog")
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT MAX(change_id) FROM $changelog")
      if (rs.next() && rs.getObject(1) != null) rs.getLong(1) else 0L
    } finally conn.close()
  }

  /** The snapshot phase of the gapless handoff: watermark first, then
    * the partitioned scan. Feed `watermark` to the CDC lane as
    * `startCursor` (or `resumeStream`) for the CDC phase.
    */
  def snapshotWithWatermark(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      changelog: String = "changelog",
      namespace: String = "public"): (Long, DataFrame) = {
    val watermark = currentCursor(url, changelog)
    (watermark,
      snapshot(spark, url, table, partitionColumn, lowerBound, upperBound,
        numPartitions, namespace))
  }

  /** The CDC phase: a streaming poll of the changelog starting strictly
    * after `fromCursor` (the snapshot watermark).
    */
  def resumeStream(
      spark: SparkSession,
      url: String,
      fromCursor: Long,
      changelog: String = "changelog",
      numPartitions: Int = 4,
      maxRowsPerBatch: Long = 0L): DataFrame = {
    val r = spark.readStream.format("graft-jdbc-cdc")
      .option("url", url)
      .option("changelog", changelog)
      .option("startCursor", fromCursor)
      .option("numPartitions", numPartitions)
    (if (maxRowsPerBatch > 0) r.option("maxRowsPerBatch", maxRowsPerBatch) else r).load()
  }

  /** Batch flavor of the CDC poll (everything currently past the cursor)
    * — used by tests and bounded backfills.
    */
  def changesBatch(
      spark: SparkSession,
      url: String,
      fromCursor: Long,
      changelog: String = "changelog",
      numPartitions: Int = 4): DataFrame =
    spark.read.format("graft-jdbc-cdc")
      .option("url", url)
      .option("changelog", changelog)
      .option("startCursor", fromCursor)
      .option("numPartitions", numPartitions)
      .load()
}

package graft.sources.jdbc

import java.sql.{Connection, DriverManager, PreparedStatement, ResultSet}
import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.ChangeEvent
import graft.sources.cdc.WireJson

/** Database-reading CDC lane — the "pragmatic v1" of SURVEY §2A S1: a
  * DataSourceV2 `MicroBatchStream` that POLLS a monotonic-cursor
  * changelog table over JDBC, emitting the same ChangeEvent schema as
  * the wire-file and pgoutput lanes (reference `connector.go:51-56`
  * constructs its CDC stream from the database connection config;
  * `README.md:65-70` describes the snapshot→CDC handoff this lane
  * implements together with [[JdbcSnapshot]]).
  *
  * Changelog contract (the Debezium-outbox shape a trigger or
  * application maintains alongside each captured table):
  *
  * {{{
  * CREATE TABLE changelog (
  *   change_id       BIGINT  -- monotonic commit cursor (identity/sequence)
  *   event_time      TIMESTAMP,
  *   table_namespace VARCHAR, table_name VARCHAR,
  *   op              VARCHAR,  -- INSERT | UPDATE | DELETE
  *   old_data        VARCHAR,  -- JSON object or NULL
  *   new_data        VARCHAR)  -- JSON object or NULL
  * }}}
  *
  * Offsets are cursor values: a micro-batch is the half-open id range
  * `(start, end]`, split into `numPartitions` contiguous sub-ranges so
  * the poll parallelizes like any partitioned JDBC read. The checkpoint
  * commits after the sink write, so restart resumes from the last ACK'd
  * cursor — the resume-from-confirmed-LSN guarantee (at-least-once,
  * reference `producer_batch.go:141-151`).
  *
  * `maxRowsPerBatch` maps the reference's producer batch sizing (O13)
  * onto Spark's admission control (`SupportsAdmissionControl` /
  * `ReadLimit.maxRows`): each trigger advances the cursor by at most
  * that many rows.
  *
  * Ordering caveat (documented, inherent to cursor polling): the cursor
  * orders by id assignment, not commit visibility — a long-running
  * transaction can commit an older id after a newer one was already
  * polled. The faithful-order lane is the wire-file/pgoutput source;
  * this lane is the "existing database, no replication slot" on-ramp.
  * At 100 TB scale the poll is a metadata query (MAX(cursor)) plus an
  * indexed range scan per batch — the database does no more work than
  * the reference's replication-slot read.
  */
class JdbcCdcSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-jdbc-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ChangeEvent.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // raw properties carry the caller's original key case
    val opts = new CaseInsensitiveStringMap(properties)
    new JdbcCdcTable(JdbcCdcOptions(
      url = opts.get("url"),
      changelog = Option(opts.get("changelog")).getOrElse("changelog"),
      startCursor = Option(opts.get("startCursor")).map(_.toLong).getOrElse(0L),
      numPartitions = Option(opts.get("numPartitions")).map(_.toInt).getOrElse(4),
      maxRowsPerBatch = Option(opts.get("maxRowsPerBatch")).map(_.toLong).getOrElse(0L)))
  }
}

final case class JdbcCdcOptions(
    url: String,
    changelog: String,
    startCursor: Long,
    numPartitions: Int,
    maxRowsPerBatch: Long) {
  require(url != null, "graft-jdbc-cdc requires .option(\"url\", jdbcUrl)")
  // identifier whitelist — the table name is interpolated into SQL text
  require(changelog.matches("[A-Za-z0-9_.]+"),
    s"illegal changelog table name: $changelog")
  require(numPartitions > 0, "numPartitions must be positive")
}

final class JdbcCdcTable(opts: JdbcCdcOptions) extends Table with SupportsRead {
  override def name(): String = s"graft-jdbc-cdc:${opts.changelog}"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JdbcCdcScanBuilder(opts)
}

/** Same publication-knob pushdown surface as the wire-file lane — but
  * here pushed filters become WHERE predicates in the poll query, so the
  * DATABASE prunes unpublished ops/tables before they cross the wire.
  */
final class JdbcCdcScanBuilder(opts: JdbcCdcOptions)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  private def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => JdbcCdcScan.filterColumns.contains(a) && v != null
    // an empty or null-containing IN must stay a Spark-side residual:
    // claiming it pushed while rendering no predicate would silently
    // return every row where the right answer is none
    case In(a, vs) =>
      JdbcCdcScan.filterColumns.contains(a) && vs != null &&
        vs.nonEmpty && vs.forall(_ != null)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (p, residual) = filters.partition(pushable)
    pushed = p
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new JdbcCdcScan(opts, pushed)
}

object JdbcCdcScan {
  /** attribute name → changelog column for pushable filters */
  val filterColumns: Map[String, String] = Map(
    "op" -> "op", "tableName" -> "table_name", "tableNamespace" -> "table_namespace")

  /** Render pushed filters as a parameterized WHERE fragment. */
  def filterSql(filters: Array[Filter]): (String, Seq[String]) = {
    val parts = filters.toSeq.collect {
      case EqualTo(a, v) if filterColumns.contains(a) =>
        (s"${filterColumns(a)} = ?", Seq(v.toString))
      case In(a, vs) if filterColumns.contains(a) && vs.nonEmpty =>
        (s"${filterColumns(a)} IN (${Seq.fill(vs.length)("?").mkString(", ")})",
          vs.toSeq.map(_.toString))
    }
    (parts.map { case (sql, _) => s" AND $sql" }.mkString,
      parts.flatMap { case (_, args) => args })
  }
}

final class JdbcCdcScan(opts: JdbcCdcOptions, filters: Array[Filter]) extends Scan {
  override def readSchema(): StructType = ChangeEvent.schema
  override def description(): String =
    s"graft-jdbc-cdc changelog=${opts.changelog} pushed=[${filters.mkString(", ")}]"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JdbcCdcMicroBatchStream(opts, filters)
  override def toBatch: Batch = new Batch {
    private val stream = new JdbcCdcMicroBatchStream(opts, filters)
    override def planInputPartitions(): Array[InputPartition] =
      stream.planInputPartitions(
        JdbcCdcOffset(opts.startCursor),
        stream.latestOffset(JdbcCdcOffset(opts.startCursor), ReadLimit.allAvailable()))
    override def createReaderFactory(): PartitionReaderFactory = stream.createReaderFactory()
  }
}

/** Offset = last consumed changelog cursor value (inclusive). */
final case class JdbcCdcOffset(cursor: Long) extends Offset {
  override def json(): String = s"""{"cursor":$cursor}"""
}

object JdbcCdcOffset {
  private val mapper = new ObjectMapper()
  def fromJson(json: String): JdbcCdcOffset =
    JdbcCdcOffset(mapper.readTree(json).path("cursor").asLong())
}

final class JdbcCdcMicroBatchStream(opts: JdbcCdcOptions, filters: Array[Filter])
    extends MicroBatchStream with SupportsAdmissionControl {

  private def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(opts.url)
    try f(conn) finally conn.close()
  }

  override def initialOffset(): Offset = JdbcCdcOffset(opts.startCursor)
  override def deserializeOffset(json: String): Offset = JdbcCdcOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // the changelog is the durable log
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    if (opts.maxRowsPerBatch > 0) ReadLimit.maxRows(opts.maxRowsPerBatch)
    else ReadLimit.allAvailable()

  /** Plain latestOffset is only called when admission control is not
    * engaged — equivalent to no limit.
    */
  override def latestOffset(): Offset =
    latestOffset(JdbcCdcOffset(opts.startCursor), ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[JdbcCdcOffset].cursor
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _              => 0L
    }
    val sql =
      if (cap > 0)
        // cursor at rank `cap` past `from`: the batch end that admits at
        // most maxRows rows (FETCH FIRST is evaluated inside the subquery)
        s"""SELECT MAX(cid) FROM (
           |  SELECT change_id AS cid FROM ${opts.changelog}
           |  WHERE change_id > ? ORDER BY change_id
           |  FETCH FIRST $cap ROWS ONLY) capped""".stripMargin
      else s"SELECT MAX(change_id) FROM ${opts.changelog} WHERE change_id > ?"
    val end = withConnection { conn =>
      val ps = conn.prepareStatement(sql)
      ps.setLong(1, from)
      val rs = ps.executeQuery()
      val v = if (rs.next() && rs.getObject(1) != null) rs.getLong(1) else from
      rs.close(); ps.close()
      v
    }
    JdbcCdcOffset(math.max(end, from))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[JdbcCdcOffset].cursor
    val hi = end.asInstanceOf[JdbcCdcOffset].cursor
    if (hi <= lo) return Array.empty
    // contiguous value ranges; a SERIAL/identity cursor is dense, so the
    // split is balanced without a per-batch histogram query
    val n = math.min(opts.numPartitions.toLong, hi - lo).toInt
    val step = (hi - lo) / n
    val rem = (hi - lo) % n
    var cur = lo
    Array.tabulate(n) { i =>
      val width = step + (if (i < rem) 1 else 0)
      val p = JdbcCdcInputPartition(cur, cur + width)
      cur += width
      p: InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JdbcCdcReaderFactory(opts, filters)
}

/** One poll sub-range: changelog rows with `lo < change_id <= hi`. */
final case class JdbcCdcInputPartition(lo: Long, hi: Long) extends InputPartition

final class JdbcCdcReaderFactory(opts: JdbcCdcOptions, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JdbcCdcInputPartition]
    new JdbcCdcPartitionReader(opts, filters, p.lo, p.hi)
  }
}

final class JdbcCdcPartitionReader(
    opts: JdbcCdcOptions, filters: Array[Filter], lo: Long, hi: Long)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var conn: Connection = _
  private var ps: PreparedStatement = _
  private var rs: ResultSet = _
  private var current: InternalRow = _

  private def open(): Unit = {
    conn = DriverManager.getConnection(opts.url)
    val (filterSql, filterArgs) = JdbcCdcScan.filterSql(filters)
    ps = conn.prepareStatement(
      s"""SELECT event_time, table_namespace, table_name, op, old_data, new_data
         |FROM ${opts.changelog}
         |WHERE change_id > ? AND change_id <= ?$filterSql
         |ORDER BY change_id""".stripMargin)
    ps.setLong(1, lo)
    ps.setLong(2, hi)
    filterArgs.zipWithIndex.foreach { case (v, i) => ps.setString(i + 3, v) }
    rs = ps.executeQuery()
  }

  private def jsonMap(s: String) =
    if (s == null) null else WireJson.toMap(mapper.readTree(s))

  override def next(): Boolean = {
    if (rs == null) open()
    if (rs.next()) {
      current = InternalRow(
        WireJson.timestampMicros(rs.getTimestamp(1)),
        WireJson.utf8(rs.getString(2)), WireJson.utf8(rs.getString(3)),
        jsonMap(rs.getString(5)), jsonMap(rs.getString(6)),
        WireJson.utf8(rs.getString(4)))
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = {
    if (rs != null) rs.close()
    if (ps != null) ps.close()
    if (conn != null) conn.close()
  }
}

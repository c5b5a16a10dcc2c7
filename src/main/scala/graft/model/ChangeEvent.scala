package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Normalized row-change event — the engine's core data type.
  *
  * Re-expresses the reference's `Message` (message.go:9-18): one row change
  * (INSERT/UPDATE/DELETE/SNAPSHOT) with optional pre/post images held as
  * string maps (dynamic-schema lane — the reference's `map[string]any`,
  * message.go:14-15). A bound-schema lane is available via
  * [[graft.transform.Handlers.bindSchema]] (`from_json` with a per-table
  * StructType), mirroring how reference handlers duck-type the map values
  * (example/simple/main.go:119).
  *
  * At 100 TB scale this is a *columnar* stream: a `Dataset[ChangeEvent]`
  * partitioned by (tableNamespace, tableName) — not row-at-a-time Go maps.
  */
case class ChangeEvent(
    eventTime: Timestamp,
    tableNamespace: String,
    tableName: String,
    oldData: Map[String, String],
    newData: Map[String, String],
    op: String) {
  def isInsert: Boolean   = op == Op.Insert
  def isUpdate: Boolean   = op == Op.Update
  def isDelete: Boolean   = op == Op.Delete
  def isSnapshot: Boolean = op == Op.Snapshot
  def isTruncate: Boolean = op == Op.Truncate
  def fullTableName: String = s"$tableNamespace.$tableName"
}

/** `MessageType` enum (message.go:64-77), plus TRUNCATE — the reference
  * decodes pgoutput Truncate but silently drops it
  * (`connector.go:140-142`); a publication can publish it
  * (`example/simple/main.go:60-65`, config.go's operations knob), and a
  * replica sink that never hears about a truncation diverges forever —
  * so here it is a first-class op: no row images, one event per
  * truncated relation.
  */
object Op {
  val Insert   = "INSERT"
  val Update   = "UPDATE"
  val Delete   = "DELETE"
  val Snapshot = "SNAPSHOT"
  val Truncate = "TRUNCATE"
  /** Row-image-carrying ops (what [[ChangeEvent.oldData]]/`newData`
    * are populated for) — the serializers' default emit set.
    */
  val rowOps: Seq[String] = Seq(Insert, Update, Delete, Snapshot)
  /** Every known op, TRUNCATE included — the "is this event well-formed"
    * set the quality counters check against.
    */
  val all: Seq[String] = rowOps :+ Truncate
}

object ChangeEvent {
  /** StructType schema of the dynamic-lane change stream (§1.4 of SURVEY). */
  val schema: StructType = StructType(Seq(
    StructField("eventTime", TimestampType),
    StructField("tableNamespace", StringType),
    StructField("tableName", StringType),
    StructField("oldData", MapType(StringType, StringType)),
    StructField("newData", MapType(StringType, StringType)),
    StructField("op", StringType)))
}

/** Kafka producer record header (handler.go:5; kafka.Header). */
case class KafkaHeader(key: String, value: Array[Byte])

/** The engine's sink contract — identical to Spark's Kafka sink columns
  * (topic/key/value/headers), which is itself the reference's
  * `[]kafka.Message` output shape (handler.go:5).
  */
case class KafkaRecord(
    topic: String,
    key: Array[Byte],
    value: Array[Byte],
    headers: Seq[KafkaHeader])

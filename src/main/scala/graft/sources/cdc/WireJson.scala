package graft.sources.cdc

import java.time.Instant

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JSON → Catalyst conversion helpers shared by the change-event readers
  * (file-wire `CdcPartitionReader`, JDBC changelog
  * `graft.sources.jdbc.JdbcCdcSource`): both lanes surface the pre/post
  * row images as `map<string,string>` per the ChangeEvent schema
  * (reference `message.go:14-15`, `map[string]any` duck-typed lane).
  */
private[graft] object WireJson {

  def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** A JSON object node → Catalyst string map (null-safe, null values kept). */
  def toMap(node: JsonNode): ArrayBasedMapData =
    if (node == null || node.isNull) null
    else {
      val keys = new ArrayBuffer[UTF8String]
      val vals = new ArrayBuffer[UTF8String]
      node.properties().asScala.foreach { e =>
        keys += utf8(e.getKey)
        vals += (if (e.getValue.isNull) null else utf8(e.getValue.asText()))
      }
      new ArrayBasedMapData(
        ArrayData.toArrayData(keys.toArray), ArrayData.toArrayData(vals.toArray))
    }

  /** Name→value pairs → Catalyst string map (null = absent image; null
    * values kept as SQL NULLs) — the pgoutput lane's counterpart of
    * [[toMap]].
    */
  def toMapFromPairs(pairs: Seq[(String, String)]): ArrayBasedMapData =
    if (pairs == null) null
    else new ArrayBasedMapData(
      ArrayData.toArrayData(pairs.map(p => utf8(p._1)).toArray),
      ArrayData.toArrayData(pairs.map(p => utf8(p._2)).toArray))

  /** ISO-8601 instant string → epoch micros (0 when absent). */
  def instantMicros(text: String): Long =
    if (text == null) 0L
    else {
      val i = Instant.parse(text)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

  /** java.sql.Timestamp → epoch micros (0 when null). */
  def timestampMicros(ts: java.sql.Timestamp): Long =
    if (ts == null) 0L
    else ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
}

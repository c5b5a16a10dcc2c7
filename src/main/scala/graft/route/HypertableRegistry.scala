package graft.route

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** LIVE chunk→hypertable parent registry. The reference's upstream engine
  * maintains this map from the TimescaleDB catalog while the stream runs
  * (`/root/reference/connector.go:204-209`), so a chunk table created by
  * DDL mid-stream routes to its parent without a restart; a frozen
  * constructor map (TopicRouter's default) cannot do that.
  *
  * `refresh()` pulls the current map from the catalog source — a JDBC
  * query against the catalog, a file the DDL pipeline maintains, or any
  * other thunk. The dynamic pipeline lane
  * ([[graft.streaming.CdcPipeline.startToParquetLiveRouting]]) snapshots
  * it once per micro-batch: within a batch the map is still a compiled
  * literal (codegen'd O(1) probe, no shuffle, no driver round-trips per
  * row), between batches it is free to change. A failed refresh keeps the
  * last good snapshot rather than dropping to an empty map (mis-routing
  * every chunk event because the catalog hiccuped is the one failure mode
  * this must not have).
  */
final class HypertableRegistry(refresh: () => Map[String, String]) {
  @volatile private var current: Map[String, String] = Map.empty

  /** Pull the latest map (called once per micro-batch); falls back to the
    * last good snapshot if the source errors.
    */
  def snapshot(): Map[String, String] = {
    try current = refresh()
    catch { case _: Exception => () }
    current
  }

  /** The last pulled map, without refreshing. */
  def last: Map[String, String] = current
}

object HypertableRegistry {
  private val mapper = new ObjectMapper()

  /** Registry backed by a JSON object file `{"chunk_full_name":
    * "parent_full_name", ...}` — the file-lane analog of the catalog
    * query (absent/empty file = no hypertables).
    */
  def fromJsonFile(path: Path): HypertableRegistry =
    new HypertableRegistry(() =>
      if (!Files.exists(path)) Map.empty
      else {
        val node = mapper.readTree(Files.readAllBytes(path))
        node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      })

  /** Fixed-map registry (tests, or genuinely static deployments). */
  def static(m: Map[String, String]): HypertableRegistry =
    new HypertableRegistry(() => m)
}

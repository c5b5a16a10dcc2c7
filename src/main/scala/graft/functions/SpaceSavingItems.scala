package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.streaming.SpaceSaving

/** Batch twin of the streaming SpaceSaving heavy-hitter lane
  * ([[graft.streaming.EventStreams.heavyHitters]]): a typed Aggregator
  * whose reduce is [[SpaceSaving.ingest]] and whose merge is
  * [[SpaceSaving.merge]] — the SAME core the streaming processor and
  * the re-shard combine run, so an oracle row on this aggregator
  * anchors that shared code, not a parallel implementation.
  *
  * Exactness property (the q77 full-capacity discipline, third sketch
  * family): with capacity ≥ the true distinct count the eviction
  * branch never fires in any reduce and no merge input is ever full —
  * ingest is then plain counting, merge plain per-word summation, and
  * every overcount is 0 — so a plain GROUP-BY/ORDER-BY oracle grades
  * the whole reduce/merge/finish machinery exactly AND order-freely
  * (bounded-capacity SpaceSaving is ingestion-order-dependent, which
  * is why only the full-capacity point can be a registered query; the
  * bounded path carries the classic guarantees, spec-graded in
  * SpaceSavingItemsSpec on top of EventStreamsSpec's streaming laws).
  */
final case class SsSummary(capacity: Int,
    tbl: mutable.Map[String, (Long, Long)])

object SpaceSavingItems {

  /** udaf over a string column: returns (item, count_est, overcount)
    * structs sorted by (count_est desc, item) for deterministic
    * downstream explode.
    */
  def aggregator(capacity: Int): Aggregator[String, SsSummary, Array[(String, Long, Long)]] =
    new Aggregator[String, SsSummary, Array[(String, Long, Long)]] {
      override def zero: SsSummary = SsSummary(capacity, mutable.Map.empty)
      override def reduce(b: SsSummary, a: String): SsSummary = {
        if (a != null) SpaceSaving.ingest(b.tbl, a, 1L, b.capacity)
        b
      }
      override def merge(b1: SsSummary, b2: SsSummary): SsSummary =
        SsSummary(capacity, mutable.Map.empty ++
          SpaceSaving.merge(b1.tbl.toMap, b2.tbl.toMap, capacity))
      override def finish(r: SsSummary): Array[(String, Long, Long)] =
        r.tbl.toArray.map { case (w, (c, e)) => (w, c, e) }
          .sortBy { case (w, c, _) => (-c, w) }
      override def bufferEncoder: Encoder[SsSummary] = Encoders.kryo[SsSummary]
      override def outputEncoder: Encoder[Array[(String, Long, Long)]] =
        ExpressionEncoder[Array[(String, Long, Long)]]()
    }
}

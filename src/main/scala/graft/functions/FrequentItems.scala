package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters: a mergeable frequent-items summary with the
  * classic guarantee — every item with true frequency > n/capacity
  * survives, and each reported count undercounts by at most n/capacity
  * (n = items seen). The 100 TB shape: per-partition summaries of
  * `capacity` entries flow into one merge, replacing a full
  * (token)-keyed shuffle for "top vocabulary / hottest URLs / heaviest
  * keys" questions with constant-size state per task.
  *
  * Exactness property (the full-probe trick, sketch edition): with
  * capacity ≥ the true distinct count the decrement branch never fires
  * anywhere — reduce and merge are then plain exact counting — so the
  * registered query's GROUP-BY/ORDER-BY oracle grades the whole
  * Aggregator machinery exactly; the bounded-capacity path is the same
  * code, error-bound-graded in FrequentItemsSpec.
  */
final case class MgSummary(capacity: Int, counts: mutable.HashMap[String, Long]) {

  def insert(x: String, w: Long = 1L): MgSummary = {
    counts.get(x) match {
      case Some(c) => counts.update(x, c + w)
      case None =>
        counts.update(x, w)
        if (counts.size > capacity) decrementAll()
    }
    this
  }

  /** The MG step: removing one occurrence of EVERY tracked item (and
    * dropping zeros) keeps the undercount bound while shedding a slot.
    */
  private def decrementAll(): Unit = {
    val dec = counts.valuesIterator.min
    val dead = mutable.ArrayBuffer.empty[String]
    counts.keysIterator.foreach { k =>
      val c = counts(k) - dec
      if (c <= 0L) dead += k else counts.update(k, c)
    }
    dead.foreach(counts.remove)
  }

  def merge(o: MgSummary): MgSummary = {
    o.counts.foreach { case (k, v) => insert(k, v) }
    this
  }
}

object FrequentItems {

  /** udaf over a string column: returns (item, count) structs, sorted by
    * (count desc, item) for deterministic downstream explode.
    */
  def aggregator(capacity: Int): Aggregator[String, MgSummary, Array[(String, Long)]] =
    new Aggregator[String, MgSummary, Array[(String, Long)]] {
      override def zero: MgSummary = MgSummary(capacity, mutable.HashMap.empty)
      override def reduce(b: MgSummary, a: String): MgSummary =
        if (a == null) b else b.insert(a)
      override def merge(b1: MgSummary, b2: MgSummary): MgSummary = b1.merge(b2)
      override def finish(r: MgSummary): Array[(String, Long)] =
        r.counts.toArray.sortBy { case (k, c) => (-c, k) }
      override def bufferEncoder: Encoder[MgSummary] = Encoders.kryo[MgSummary]
      override def outputEncoder: Encoder[Array[(String, Long)]] =
        ExpressionEncoder[Array[(String, Long)]]()
    }
}

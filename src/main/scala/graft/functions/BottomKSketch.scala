package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Bottom-k sketch as a typed `Aggregator` (the custom-aggregation lane,
  * SURVEY §2B "UDF surface"): keeps the k smallest xxhash64-style hashes
  * of the values seen. Properties that matter at 100 TB:
  *
  *   - **mergeable**: partial sketches combine associatively and
  *     commutatively, so Spark runs it map-side-partial like any built-in
  *     aggregate;
  *   - **deterministic sample**: "k smallest by hash" is a uniform sample
  *     of the DISTINCT values that every partition order produces
  *     identically — unlike reservoir sampling, no RNG state;
  *   - **distinct-count estimate**: if the sketch saturates,
  *     D ≈ (k-1) · 2⁶⁴ / (max kept hash − Long.MinValue) — the classic
  *     KMV estimator.
  */
final case class BottomK(k: Int, hashes: mutable.TreeSet[Long]) {
  def insert(h: Long): BottomK = {
    if (hashes.size < k) hashes.add(h)
    else if (h < hashes.last) { hashes.add(h); if (hashes.size > k) hashes.remove(hashes.last) }
    this
  }
  def merge(o: BottomK): BottomK = { o.hashes.foreach(insert); this }

  /** KMV distinct estimate (exact when not saturated). */
  def estimateDistinct: Double =
    if (hashes.size < k) hashes.size.toDouble
    else {
      val kth = hashes.last
      // fraction of the hash space covered by the k smallest values
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
      (k - 1) / frac
    }
}

object BottomKSketch {

  /** 64-bit avalanche hash (splitmix64 finalizer — public-domain
    * constant-set, same family Spark's XxHash64 draws on).
    */
  def hash64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def aggregator(k: Int): Aggregator[Long, BottomK, Array[Long]] =
    new Aggregator[Long, BottomK, Array[Long]] {
      override def zero: BottomK = BottomK(k, mutable.TreeSet.empty[Long])
      override def reduce(b: BottomK, a: Long): BottomK = b.insert(hash64(a))
      override def merge(b1: BottomK, b2: BottomK): BottomK = b1.merge(b2)
      override def finish(r: BottomK): Array[Long] = r.hashes.toArray
      override def bufferEncoder: Encoder[BottomK] = Encoders.kryo[BottomK]
      override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }
}

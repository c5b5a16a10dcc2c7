package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-nearest-neighbor majority vote as a typed `Aggregator`
  * (the custom-aggregation lane — the BottomKSketch pattern): per
  * group, keep the k best (cos_sim, nid, nlabel) neighbors by
  * (cos_sim DESC, nid ASC) in a fixed-size insertion buffer, and
  * finish with the majority label (ties to the smallest label).
  *
  * r16 optimization for q212: the sort-based spelling
  * (row_number window + rnk ≤ k filter + two vote aggregates) paid a
  * full local SORT of all N² candidate rows to keep 3 of them per
  * query — WindowGroupLimit prunes the exchange, not the sort. A
  * bounded aggregate is the sort-free form of the same selection:
  * map-side partials keep ≤ k rows per group, merge is an O(k²)
  * bounded merge, and the double comparison is exactly Spark's sort
  * semantics for non-NaN doubles (primitive <, >, so ±0.0 compare
  * equal and the nid tiebreak decides — cos_sim here is never NaN:
  * the zero-norm guard yields literal 0.0). Q212 oracle + KnnVoteSpec
  * pin equality against the window spelling.
  */
final case class KnnTop(k: Int,
    cos: Array[Double], nid: Array[Long], lab: Array[Int], var n: Int) {

  /** true iff (c1, n1) ranks strictly better than (c2, n2). NaN ranks
    * GREATEST (first under cos DESC) and ties with itself — the exact
    * total order the replaced window sort used — so the equivalence
    * holds even if a non-finite embedding ever slips a NaN cos_sim past
    * the zero-norm guard; primitive compare otherwise keeps ±0.0 equal
    * (Spark normalizes signed zeros before ordering).
    */
  @inline private def better(c1: Double, n1: Long, c2: Double, n2: Long): Boolean = {
    val nan1 = java.lang.Double.isNaN(c1)
    val nan2 = java.lang.Double.isNaN(c2)
    if (nan1 != nan2) nan1
    else if (!nan1 && c1 > c2) true
    else if (!nan1 && c1 < c2) false
    else n1 < n2
  }

  def insert(c: Double, id: Long, l: Int): KnnTop = {
    if (n < k) {
      // insertion position among the n kept (kept sorted best-first)
      var i = n
      while (i > 0 && better(c, id, cos(i - 1), nid(i - 1))) i -= 1
      var j = n
      while (j > i) { cos(j) = cos(j - 1); nid(j) = nid(j - 1); lab(j) = lab(j - 1); j -= 1 }
      cos(i) = c; nid(i) = id; lab(i) = l; n += 1
    } else if (better(c, id, cos(n - 1), nid(n - 1))) {
      var i = n - 1
      while (i > 0 && better(c, id, cos(i - 1), nid(i - 1))) i -= 1
      var j = n - 1
      while (j > i) { cos(j) = cos(j - 1); nid(j) = nid(j - 1); lab(j) = lab(j - 1); j -= 1 }
      cos(i) = c; nid(i) = id; lab(i) = l
    }
    this
  }

  def merge(o: KnnTop): KnnTop = {
    var i = 0
    while (i < o.n) { insert(o.cos(i), o.nid(i), o.lab(i)); i += 1 }
    this
  }

  /** Majority label of the kept neighbors, votes DESC then label ASC —
    * the exact argmax the window spelling's two vote aggregates compute.
    */
  def vote: Int = {
    var bestLabel = Int.MaxValue
    var bestVotes = -1
    var i = 0
    while (i < n) {
      val l = lab(i)
      var v = 0
      var j = 0
      while (j < n) { if (lab(j) == l) v += 1; j += 1 }
      if (v > bestVotes || (v == bestVotes && l < bestLabel)) {
        bestVotes = v; bestLabel = l
      }
      i += 1
    }
    bestLabel
  }
}

object KnnVote {
  def aggregator(k: Int): Aggregator[(Double, Long, Int), KnnTop, Int] =
    new Aggregator[(Double, Long, Int), KnnTop, Int] {
      override def zero: KnnTop =
        KnnTop(k, new Array[Double](k), new Array[Long](k), new Array[Int](k), 0)
      override def reduce(b: KnnTop, a: (Double, Long, Int)): KnnTop =
        b.insert(a._1, a._2, a._3)
      override def merge(b1: KnnTop, b2: KnnTop): KnnTop = b1.merge(b2)
      override def finish(r: KnnTop): Int = r.vote
      override def bufferEncoder: Encoder[KnnTop] = Encoders.kryo[KnnTop]
      override def outputEncoder: Encoder[Int] = Encoders.scalaInt
    }
}

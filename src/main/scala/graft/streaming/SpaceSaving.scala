package graft.streaming

import scala.collection.mutable

/** Pure space-saving core (Metwally, Agrawal & El Abbadi 2005,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams") shared by the streaming [[EventStreams.heavyHitters]]
  * processor and the table combine a cluster re-shard needs. A table
  * maps word → (count_est, overcount) with the classic guarantees:
  * count_est ≥ true ≥ count_est − overcount, and — with N tokens total
  * — any word whose true count exceeds N/capacity is present.
  *
  * Everything here is driver/executor-local bounded state: a table
  * never exceeds `capacity` entries, and ingestion works on GROUPED
  * (word, count) pairs so a caller's batch buffer is bounded by the
  * batch's distinct vocabulary, never its token count.
  */
object SpaceSaving {

  type Table = mutable.Map[String, (Long, Long)]

  /** Apply `cnt` occurrences of `w` in one step — the grouped form of
    * `cnt` single-token updates, and bit-identical to them: once `w`
    * is monitored (pre-existing, inserted into free space, or
    * inserted by eviction) the remaining cnt−1 updates only increment
    * its own counter, so the fold telescopes to one addition and no
    * further evictions. Returns the evicted word, if any, so callers
    * can mirror the eviction into persistent state. The min-count
    * eviction breaks ties by word, keeping replays deterministic.
    */
  def ingest(tbl: Table, w: String, cnt: Long, capacity: Int): Option[String] = {
    require(cnt > 0L, s"non-positive count $cnt for '$w'")
    tbl.get(w) match {
      case Some((c, e)) => tbl(w) = (c + cnt, e); None
      case None if tbl.size < capacity => tbl(w) = (cnt, 0L); None
      case None =>
        val (mw, (mc, _)) = tbl.minBy { case (k, (c, _)) => (c, k) }
        tbl.remove(mw)
        tbl(w) = (mc + cnt, mc)
        Some(mw)
    }
  }

  /** Build a table from exact word counts, applied in sorted word
    * order — the deterministic-replay order the streaming processor
    * uses (equal to sorted-token order: duplicates are consecutive
    * either way).
    */
  def fromCounts(counts: Iterable[(String, Long)], capacity: Int): Table = {
    val tbl: Table = mutable.Map.empty
    counts.toSeq.sortBy(_._1).foreach { case (w, c) => ingest(tbl, w, c, capacity) }
    tbl
  }

  /** Combine two space-saving tables over (possibly overlapping)
    * streams into one `capacity`-bounded table — the mergeable-
    * summaries combine (Agarwal et al. 2012, "Mergeable Summaries",
    * §3; the operation Metwally's structure needs when two summaries
    * of sub-streams become one). A word absent from a FULL table may
    * still have occurred up to that table's minimum count times
    * (it could have been evicted at any point), so absence from a
    * full table contributes its min count to BOTH the estimate and
    * the overcount; absence from a non-full table contributes zero
    * (nothing was ever evicted, so absent truly means count 0).
    * After per-word summing, the union is re-bounded to the largest
    * `capacity` estimates (ties by word). Kept entries satisfy
    * est ≥ true_combined ≥ est − overcount exactly — the law
    * EventStreamsSpec pins on overlapping seeded-random streams.
    */
  def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)],
      capacity: Int): Map[String, (Long, Long)] = {
    // `capacity` must be the BUILD capacity of both inputs: fullness
    // (= evictions were possible) is inferred from t.size >= capacity,
    // so a larger caller-supplied capacity would classify a genuinely
    // full table as never-evicting and silently drop its absent-word
    // floor, breaking the est >= true guarantee. A table larger than
    // the claimed capacity is proof of that mismatch — fail loudly.
    require(a.size <= capacity && b.size <= capacity,
      s"merge capacity $capacity below a table size " +
        s"(${a.size}, ${b.size}) — pass the tables' build capacity")
    def floor(t: Map[String, (Long, Long)]): Long =
      if (t.size >= capacity && t.nonEmpty) t.values.map(_._1).min else 0L
    val (fa, fb) = (floor(a), floor(b))
    val merged = (a.keySet ++ b.keySet).toSeq.map { w =>
      val (ca, ea) = a.getOrElse(w, (fa, fa))
      val (cb, eb) = b.getOrElse(w, (fb, fb))
      w -> (ca + cb, ea + eb)
    }
    merged.sortBy { case (w, (c, _)) => (-c, w) }.take(capacity).toMap
  }
}

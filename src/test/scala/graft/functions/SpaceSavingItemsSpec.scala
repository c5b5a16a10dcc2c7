package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The batch SpaceSaving aggregator (q269's machinery): full-capacity
  * exactness under a parallel merge tree, and the classic bounded-
  * capacity guarantees under arbitrary reduce/merge order — the
  * order-free laws that hold for ANY Spark task scheduling, on top of
  * EventStreamsSpec's deterministic-replay streaming laws.
  */
class SpaceSavingItemsSpec extends SparkSpec {

  // skewed corpus: word w{i} appears i times, i = 1..12 (n = 78)
  private val words: Seq[String] =
    (1 to 12).flatMap(i => Seq.fill(i)(s"w${('a' + i - 1).toChar}"))
  private val truth: Map[String, Long] =
    words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }

  private def run(capacity: Int, parts: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val ss = udaf(SpaceSavingItems.aggregator(capacity))
    words.toDF("w").repartition(parts)
      .agg(ss($"w").as("top"))
      .select(explode($"top").as("t"))
      .select($"t._1", $"t._2", $"t._3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("full capacity: exact counts, zero overcounts, order-free across a parallel merge tree") {
    for (parts <- Seq(1, 7)) {
      val got = run(capacity = 64, parts)
      assert(got.map { case (w, c, _) => (w, c) }.toMap == truth)
      assert(got.forall(_._3 == 0L))
    }
  }

  test("bounded capacity: est >= true >= est - overcount, size <= capacity, heavy presence — for any reduce/merge order") {
    // cap 8 < 12 distinct so eviction fires, while n/cap = 9.75 keeps
    // the presence guarantee NON-vacuous (wj/wk/wl at 10/11/12 qualify)
    val cap = 8
    val n = words.size.toLong
    for (parts <- Seq(1, 3, 7)) {
      val got = run(cap, parts)
      assert(got.size <= cap)
      got.foreach { case (w, est, over) =>
        val t = truth.getOrElse(w, 0L)
        assert(est >= t && t >= est - over, s"$w: est=$est over=$over true=$t")
      }
      // presence guarantee: true count > n/capacity => monitored
      val kept = got.map(_._1).toSet
      truth.filter(_._2 > n / cap).keys.foreach { w =>
        assert(kept.contains(w), s"heavy hitter $w (true=${truth(w)}) evicted")
      }
    }
  }
}

package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native as-of operator (logical node + strategy + physical exec):
  * semantics on engineered fixtures, equivalence with the q17
  * union-window composition on real data, and the physical-plan
  * contract (one exchange + sort per side, AsofJoinExec planned).
  */
class NativeAsofSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("backward semantics: latest right at-or-before, ties to last in order") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "ltag")
    val right = Seq(
      (1L, 10L, "exact"),   // t=10: at-or-before for l1 (<=)
      (1L, 15L, "mid"),     // latest before l2
      (1L, 15L, "mid2"),    // same time: tie -> last in tiebreak order
      (1L, 99L, "future"),  // after everything
      (3L, 1L, "other"))    // key never probed
      .toDF("k", "t", "rtag")
      .withColumnRenamed("k", "rk").withColumnRenamed("t", "rt")
    val out = NativeAsof.asofJoin(left, right,
        $"k", $"rk", $"t", $"rt", rightTieBreak = Seq($"rtag"))
      .select($"ltag", $"rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("l1") == "exact")
    assert(out("l2") == "mid2") // lexicographic tiebreak: last wins
    assert(out("l3") == null)   // key 2 has no right rows at all
  }

  test("null keys and times never match and never crash the merge") {
    import spark.implicits._
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "ltag")
    val right = Seq((Some(1L), Some(5L), "r"), (None, Some(1L), "skip"),
      (Some(1L), None, "skip2")).toDF("rk", "rt", "rtag")
    val out = NativeAsof.asofJoin(left, right, $"k", $"rk", $"t", $"rt")
      .select($"ltag", $"rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == "r")
    assert(out("b") == null && out("c") == null)
  }

  test("equivalence: the native operator reproduces q17's composition exactly") {
    import spark.implicits._
    val composed = graft.queries.AsofJoin.q17Asof(spark, dir).collect()
    val native = graft.queries.AsofJoin.q188AsofNative(spark, dir).collect()
    assert(composed.length == native.length)
    composed.zip(native).foreach { case (a, b) =>
      assert(a.getAs[Long]("event_id") == b.getAs[Long]("event_id"))
      assert(a.getAs[Long]("asof_orderkey") == b.getAs[Long]("asof_orderkey"))
    }
  }

  test("plan contract: AsofJoinExec is planned with one exchange + sort per side") {
    import spark.implicits._
    val df = graft.queries.AsofJoin.q188AsofNative(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(p.contains("AsofJoin"), s"expected the native exec node:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2,
      s"expected exactly one hash exchange per side, got $exchanges:\n$p")
    assert(p.contains("Sort ["), s"expected EnsureRequirements sorts:\n$p")
  }

  test("partition skew safety: many keys across many partitions stay correct") {
    import spark.implicits._
    // 200 keys, 20 right rows each, left probes at scattered times:
    // compare against a brute-force window answer
    val right = (1 to 200).flatMap(k => (1 to 20).map(i =>
      (k.toLong, i.toLong * 10, k * 1000L + i))).toDF("rk", "rt", "rid")
    val left = (1 to 200).flatMap(k => Seq(5L, 55L, 200L, 1L).map(t =>
      (k.toLong, t))).toDF("k", "t")
    val out = NativeAsof.asofJoin(left.repartition(7), right.repartition(5),
        $"k", $"rk", $"t", $"rt")
      .select($"k", $"t", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (1 to 200).foreach { k =>
      assert(out((k.toLong, 1L)) == -1L)          // before all rights
      assert(out((k.toLong, 5L)) == -1L)          // still before rt=10
      assert(out((k.toLong, 55L)) == k * 1000L + 5)  // rt=50 is latest <= 55
      assert(out((k.toLong, 200L)) == k * 1000L + 20) // all 20 before
    }
  }
}

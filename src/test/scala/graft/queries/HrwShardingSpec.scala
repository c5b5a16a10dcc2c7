package graft.queries

import graft.SparkSpec

/** q283 rendezvous sharding: the exact minimal-movement law, balance
  * sanity, and the pure-map plan shape.
  */
class HrwShardingSpec extends SparkSpec {

  private lazy val rows = {
    import spark.implicits._
    Sampling.q283HrwSharding(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Boolean)].collect()
  }

  test("minimal movement is EXACT: every moved key moved TO the new shard, " +
    "and unmoved keys kept their assignment") {
    assert(rows.nonEmpty)
    for ((id, s8, s9, moved) <- rows) {
      if (moved) assert(s9 == 8, s"doc $id moved to shard $s9, not the new one")
      else assert(s8 == s9, s"doc $id flagged unmoved but $s8 != $s9")
    }
  }

  test("moved fraction tracks 1/(S+1) and every shard is populated") {
    val frac = rows.count(_._4).toDouble / rows.length
    assert(frac > 0.04 && frac < 0.20, s"moved fraction $frac vs expected ~1/9")
    assert(rows.map(_._2).distinct.sorted.toSeq == (0L to 7L),
      "all 8 original shards populated")
    assert(rows.map(_._3).distinct.sorted.toSeq == (0L to 8L),
      "all 9 grown shards populated")
  }

  test("q283 is a pure map: no join, no aggregate, no exchange but the sort") {
    val df = graft.SparkEntry.queries("q283_hrw_sharding")(
      spark, "/root/testdata/sf0.001")
    val logical = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    assert(logical.collect { case j: Join => j }.isEmpty, s"no joins:\n$logical")
    assert(logical.collect { case a: Aggregate => a }.isEmpty,
      s"no aggregates:\n$logical")
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert("Exchange ".r.findAllIn(p).size <= 1,
      s"only the presentation sort may exchange:\n$p")
  }
}

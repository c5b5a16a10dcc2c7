package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q289 dominant-edge matching: equality with the SEQUENTIAL greedy
  * algorithm (the theorem the distributed formulation rests on), plus
  * one-to-one validity and maximality, on real sf0.001 data.
  */
class GreedyMatchingSpec extends SparkSpec {

  test("locally-dominant iteration equals sequential greedy; matching is valid and maximal") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    graft.GraftExtensions.register(spark)
    // the exact edge set the operator consumes (same construction)
    val edges = Entity.entityPairsUnordered(spark, dir)
      .filter(($"id1" % 2) =!= ($"id2" % 2))
      .select(
        when($"id1" % 2 === 0, $"id1").otherwise($"id2").as("a"),
        when($"id1" % 2 === 0, $"id2").otherwise($"id1").as("b"),
        call_function("jaro_winkler", $"name1", $"name2").cast("float").as("jw"))
      .as[(Long, Long, Float)].collect()
    assert(edges.nonEmpty)

    // sequential greedy: global (jw desc, a asc, b asc) order
    val seqMatched = {
      val ma = scala.collection.mutable.Set.empty[Long]
      val mb = scala.collection.mutable.Set.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Float)]
      edges.sortBy { case (a, b, jw) => (-jw, a, b) }.foreach { case (a, b, jw) =>
        if (!ma(a) && !mb(b)) { ma += a; mb += b; out += ((a, b, jw)) }
      }
      out.toSet
    }

    val got = Entity.q289GreedyMatching(spark, dir).as[(Long, Long, Float)]
      .collect().toSet
    assert(got == seqMatched, s"${got.size} vs ${seqMatched.size}")
    // validity: one-to-one on both sides
    assert(got.map(_._1).size == got.size && got.map(_._2).size == got.size)
    // maximality: every candidate edge has a matched endpoint
    val (as, bs) = (got.map(_._1), got.map(_._2))
    assert(edges.forall { case (a, b, _) => as(a) || bs(b) })
  }
}

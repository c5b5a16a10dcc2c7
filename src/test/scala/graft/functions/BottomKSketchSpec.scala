package graft.functions

import org.apache.spark.sql.functions.udaf

import graft.SparkSpec

import scala.collection.mutable

class BottomKSketchSpec extends SparkSpec {

  test("merge is order-independent (map-side-partial safe)") {
    val xs = (1L to 1000L).map(BottomKSketch.hash64)
    def build(vals: Seq[Long]): Set[Long] = {
      val b = BottomK(32, mutable.TreeSet.empty[Long])
      vals.foreach(b.insert); b.hashes.toSet
    }
    val whole = build(xs)
    val (l, r) = xs.splitAt(400)
    val merged = BottomK(32, mutable.TreeSet.from(build(l)))
      .merge(BottomK(32, mutable.TreeSet.from(build(r))))
    assert(merged.hashes.toSet == whole)
    // sample = k smallest hashes, regardless of arrival order
    assert(whole == xs.sorted.take(32).toSet)
  }

  test("KMV distinct estimate within 25% on 10k distinct values") {
    val b = BottomK(256, mutable.TreeSet.empty[Long])
    (1L to 10000L).foreach(x => b.insert(BottomKSketch.hash64(x)))
    val est = b.estimateDistinct
    assert(math.abs(est - 10000) / 10000.0 < 0.25, s"est=$est")
  }

  test("runs as a udaf over a distributed column with partial aggregation") {
    import spark.implicits._
    val sketch = udaf(BottomKSketch.aggregator(16))
    val out = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .repartition(8)
      .agg(sketch($"o_custkey").as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(out.length == 16)
    // deterministic: same result on a different partitioning
    val out2 = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .repartition(3)
      .agg(sketch($"o_custkey").as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(out.sorted == out2.sorted)
  }
}

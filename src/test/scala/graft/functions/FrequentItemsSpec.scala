package graft.functions

import org.apache.spark.sql.functions.{explode, split, udaf}

import graft.SparkSpec

/** Misra–Gries summary: exact at full capacity, classic undercount bound
  * at small capacity, heavy items never lost.
  */
class FrequentItemsSpec extends SparkSpec {

  import spark.implicits._

  test("full capacity equals exact GROUP BY counts") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(explode(split($"text", " ")).as("w"))
    val exact = toks.groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fi = udaf(FrequentItems.aggregator(1 << 20))
    val got = toks.agg(fi($"w")).collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("bounded capacity: undercount <= n/(capacity+1), heavy hitters survive") {
    val cap = 8
    // skewed synthetic stream: item "hot_i" appears (20-i)*50 times,
    // plus 400 singletons of noise
    val items = (0 until 8).flatMap(i => Seq.fill((20 - i) * 50)(s"hot_$i")) ++
      (0 until 400).map(i => s"noise_$i")
    val n = items.length.toLong
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val df = items.toDF("w")
    val fi = udaf(FrequentItems.aggregator(cap))
    val got = df.agg(fi($"w")).collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / (cap + 1)
    // every reported count is an undercount by at most the bound
    got.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
      assert(exact(k) - c <= bound, s"$k undercounted past the bound: ${exact(k) - c} > $bound")
    }
    // every item with true frequency above the bound is present
    exact.filter(_._2 > bound).keys.foreach { k =>
      assert(got.contains(k), s"heavy item $k lost (freq ${exact(k)} > bound $bound)")
    }
  }
}

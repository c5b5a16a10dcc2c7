package graft.queries

import org.scalacheck.Gen

import graft.SparkSpec
import graft.queries.Windows.latestByKey

/** Property tests for distribution laws the engine relies on:
  * partitioning preserves multisets (the reference's chunking law,
  * `internal/slices/slices.go:3-16` — order within a chunk, nothing lost,
  * nothing duplicated), latest-by-key compaction matches a reference
  * model, and approx_count_distinct stays within its advertised error.
  */
class PropertiesSpec extends SparkSpec {

  test("property: repartition preserves the multiset (chunking law)") {
    import spark.implicits._
    val data = Gen.listOfN(500, Gen.chooseNum(-1000L, 1000L)).sample.get
    val df = data.toDF("v")
    for (n <- Seq(1, 3, 7, 32)) {
      val got = df.repartition(n).as[Long].collect().sorted.toSeq
      assert(got == data.sorted, s"multiset changed at n=$n")
    }
  }

  test("property: latestByKey matches the groupBy-max reference model") {
    import spark.implicits._
    val rows = Gen.listOfN(300, for {
      k  <- Gen.chooseNum(0, 20)
      t  <- Gen.chooseNum(0L, 50L)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (k, t, id)).sample.get.distinct
    val df = rows.toDF("k", "t", "id")
    val got = latestByKey(df, Seq("k"), Seq("t", "id"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val model = rows.groupBy(_._1).view.mapValues(g => g.map(r => (r._2, r._3)).max).toMap
    assert(got == model)
  }

  test("approx_count_distinct is within its relative-error bound (HLL surface)") {
    import spark.implicits._
    val orders = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val exact = orders.select("o_custkey").distinct().count()
    val approx = orders.selectExpr("approx_count_distinct(o_custkey, 0.02) AS a")
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}

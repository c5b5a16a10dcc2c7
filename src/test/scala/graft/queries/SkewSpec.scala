package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting correctness: salted two-phase forms must equal the direct
  * forms on heavily skewed data (90% of rows on one key).
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private lazy val skewed = {
    val hot = Seq.fill(9000)(("hot", 1.0))
    val rest = (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    (hot ++ rest).toDF("k", "v").repartition(8)
  }

  test("salted sum/count equals direct groupBy aggregation") {
    val direct = skewed.groupBy($"k")
      .agg(sum($"v").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(skewed, "k", $"v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == direct.keySet)
    // sums of doubles may differ in last ulp across grouping orders; compare with tolerance
    direct.foreach { case (k, (s, c)) =>
      assert(salted(k)._2 == c, s"count mismatch for $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("salted join equals direct join on a skewed key") {
    val dim = Seq(("hot", 100), ("k1", 1), ("k2", 2)).toDF("k", "w")
    val direct = skewed.join(dim, "k").agg(sum($"v" * $"w")).collect()(0).getDouble(0)
    val salted = Skew.saltedJoin(skewed, dim, "k").agg(sum($"v" * $"w")).collect()(0).getDouble(0)
    assert(math.abs(direct - salted) < 1e-6)
    val directCnt = skewed.join(dim, "k").count()
    assert(Skew.saltedJoin(skewed, dim, "k").count() == directCnt)
  }
}

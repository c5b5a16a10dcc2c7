package graft.functions

import graft.GraftExtensions
import graft.SparkSpec

/** Native CosineSimilarity expression: value semantics, bit-equality with
  * the higher-order fold formulation, and null/edge behavior.
  */
class CosineSimilaritySpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); GraftExtensions.register(spark) }

  test("matches the aggregate-fold formulation bit-for-bit on real embeddings") {
    import spark.implicits._
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = e.select($"vec_id", $"embedding".as("x"))
    val b = e.select($"vec_id".as("vid2"), $"embedding".as("y"))
    val pairs = a.crossJoin(b).filter($"vec_id" < $"vid2").limit(500)
    val fold =
      "aggregate(sequence(0, 63), cast(0 as double), (acc, i) -> acc + cast(element_at(x, i+1) as double) * cast(element_at(y, i+1) as double))" +
        " / (sqrt(aggregate(sequence(0, 63), cast(0 as double), (acc, i) -> acc + cast(element_at(x, i+1) as double) * cast(element_at(x, i+1) as double)))" +
        " * sqrt(aggregate(sequence(0, 63), cast(0 as double), (acc, i) -> acc + cast(element_at(y, i+1) as double) * cast(element_at(y, i+1) as double))))"
    val diff = pairs
      .selectExpr(s"cosine_similarity(x, y) AS native", s"$fold AS folded")
      .filter("native <> folded") // bit-inequality (exact double compare)
      .count()
    assert(diff == 0)
  }

  test("known values, zero vectors, and nulls") {
    val rows = spark.sql(
      """SELECT
        |  cosine_similarity(array(CAST(1 AS float), CAST(0 AS float)),
        |                    array(CAST(1 AS float), CAST(0 AS float))) AS same,
        |  cosine_similarity(array(CAST(1 AS float), CAST(0 AS float)),
        |                    array(CAST(0 AS float), CAST(1 AS float))) AS ortho,
        |  cosine_similarity(array(CAST(0 AS float), CAST(0 AS float)),
        |                    array(CAST(1 AS float), CAST(1 AS float))) AS zero,
        |  cosine_similarity(CAST(NULL AS array<float>),
        |                    array(CAST(1 AS float))) AS nul
        |""".stripMargin).collect()(0)
    assert(rows.getDouble(0) == 1.0)
    assert(rows.getDouble(1) == 0.0)
    assert(rows.getDouble(2) == 0.0)
    assert(rows.isNullAt(3))
  }
}

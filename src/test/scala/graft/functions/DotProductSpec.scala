package graft.functions

import graft.GraftExtensions
import graft.SparkSpec

/** Native DotProduct expression: bit-equality with the higher-order
  * fold formulation on float×float and float×double operand mixes,
  * plus null behavior — the guarantees the q236 power-iteration lane
  * leans on.
  */
class DotProductSpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); GraftExtensions.register(spark) }

  test("float×float matches the aggregate-fold formulation bit-for-bit") {
    import spark.implicits._
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = e.select($"vec_id", $"embedding".as("x"))
    val b = e.select($"vec_id".as("vid2"), $"embedding".as("y"))
    val pairs = a.crossJoin(b).filter($"vec_id" < $"vid2").limit(500)
    val fold =
      "aggregate(sequence(0, 63), cast(0 as double), (acc, i) -> acc + cast(element_at(x, i+1) as double) * cast(element_at(y, i+1) as double))"
    val diff = pairs
      .selectExpr("dot_product(x, y) AS native", s"$fold AS folded")
      .filter("native <> folded")
      .count()
    assert(diff == 0)
  }

  test("float×double-literal matches the fold (the power-iteration operand mix)") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => 0.01 * (i % 7) - 0.02)
    val vSql = v.map(d => s"CAST($d AS DOUBLE)").mkString("array(", ", ", ")")
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val diff = e
      .selectExpr(s"dot_product(embedding, $vSql) AS native",
        s"aggregate(sequence(0, 63), cast(0 as double), (acc, i) -> acc + cast(element_at(embedding, i+1) as double) * element_at($vSql, i+1)) AS folded")
      .filter("native <> folded")
      .count()
    assert(diff == 0)
  }

  test("nulls propagate; self-dot is the squared norm") {
    val r = spark.sql(
      """SELECT
        |  dot_product(array(CAST(3 AS float), CAST(4 AS float)),
        |              array(CAST(3 AS float), CAST(4 AS float))) AS n2,
        |  dot_product(CAST(NULL AS array<float>),
        |              array(CAST(1 AS float))) AS nul
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 25.0)
    assert(r.isNullAt(1))
  }
}

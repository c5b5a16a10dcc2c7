package graft.sources

import graft.SparkSpec

/** The SQL front door: Tables.createViews + spark.sql over the same
  * normalized tables the DataFrame lane reads — a star join and an
  * event-time query (exercising the nanos-ts normalization through SQL).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("star join through spark.sql matches the DataFrame lane") {
    Tables.createViews(spark, dir)
    val sql = spark.sql(
      """SELECT r.r_name, COUNT(*) AS n_nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin).collect()
    import spark.implicits._
    val df = Tables.load(spark, dir, "region").as("r")
      .join(Tables.load(spark, dir, "nation").as("n"),
        $"n.n_regionkey" === $"r.r_regionkey")
      .groupBy($"r.r_name")
      .count().orderBy($"r_name").collect()
    assert(sql.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      df.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(sql.map(_.getLong(1)).sum == 25) // 25 nations total
  }

  test("events view exposes normalized microsecond timestamps to SQL") {
    Tables.createViews(spark, dir)
    val r = spark.sql(
      "SELECT COUNT(*) AS n, MIN(ts) AS t0 FROM events WHERE ts IS NOT NULL").collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.get(1).isInstanceOf[java.sql.Timestamp])
  }

  test("native expressions are callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    Tables.createViews(spark, dir)
    val n = spark.sql(
      """SELECT doc_id FROM documents
        |WHERE size(word_shingle_hashes(text)) > 5 LIMIT 5""".stripMargin).count()
    assert(n > 0)
  }
}

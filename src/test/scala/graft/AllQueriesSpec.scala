package graft

/** Smoke guard for the driver contract: every SparkEntry.queries entry
  * must execute at sf0.001, and every oracleSql key must have a matching
  * query. Catches wiring mistakes (renamed/missing entries, queries that
  * only break at runtime) before the round gate does.
  */
class AllQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}

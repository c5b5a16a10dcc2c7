package graft.sources

import graft.SparkSpec

/** Bucketed co-located joins: after paying the shuffle once at write
  * time, the join between two tables bucketed on the same key plans
  * WITHOUT any Exchange — the property that makes recurring fact-dim
  * joins cheap at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("join of co-bucketed tables has no shuffle exchange in the plan") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)
    // force the shuffle-join path: at this toy scale Spark would broadcast
    // (which ignores bucketing entirely — "disabled by query planner");
    // at the scale bucketing exists for, neither side is broadcastable
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cosortedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      // and the result is still the real join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
      assert(expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

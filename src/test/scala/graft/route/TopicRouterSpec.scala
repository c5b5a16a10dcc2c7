package graft.route

import org.scalacheck.Gen

import graft.SparkSpec

/** Routing tiers (reference `connector.go:194-265`): exact, hypertable
  * parent, `_`-prefix partition parent, unmapped-drop, empty-mapping
  * pass-through — on both the pure and the column-expression lanes.
  */
class TopicRouterSpec extends SparkSpec {

  private val router = TopicRouter(
    mapping = Map(
      "public.users"        -> "users-topic",
      "public.orders"       -> "orders-topic",
      "public.orders_large" -> "orders-large-topic"),
    hypertableParents = Map("public.metrics_chunk_7" -> "public.users"))

  test("exact mapping hit") {
    assert(router.resolve("public", "users").contains("users-topic"))
  }

  test("unmapped table drops (None)") {
    assert(router.resolve("public", "unknown").isEmpty)
  }

  test("hypertable chunk resolves to parent's topic") {
    assert(router.resolve("public", "metrics_chunk_7").contains("users-topic"))
  }

  test("partition table resolves via shortest _-prefix: orders_2024_01 -> orders") {
    assert(router.resolve("public", "orders_2024_01").contains("orders-topic"))
  }

  test("shortest matching prefix wins: orders_large_2024 -> orders (1-part prefix probed first)") {
    // Go loop probes prefixes in increasing length (connector.go:254-262):
    // "orders" matches before "orders_large" is even tried.
    assert(router.resolve("public", "orders_large_2024").contains("orders-topic"))
  }

  test("empty mapping routes everything with empty default topic") {
    assert(TopicRouter(Map.empty).resolve("public", "whatever").contains(""))
  }

  test("column lane agrees with pure lane on all tiers") {
    import spark.implicits._
    val names = Seq(
      "users", "orders", "orders_large", "orders_2024_01", "orders_large_2024",
      "metrics_chunk_7", "unknown", "no_underscore", "users_p0", "a_b_c_d")
    val got = names.toDF("t")
      .withColumn("topic", router.resolveColumn(org.apache.spark.sql.functions.lit("public"), $"t"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    names.foreach { n =>
      assert(got(n) == router.resolve("public", n), s"mismatch for $n")
    }
  }

  test("property: column lane ≡ pure lane on random underscore names") {
    import spark.implicits._
    val part = Gen.oneOf("users", "orders", "metrics", "x", "2024", "01", "p0")
    val nameGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, part)).map(_.mkString("_"))
    val names = graft.GenUtil.sampled(Gen.listOfN(300, nameGen)).distinct
    val got = names.toDF("t")
      .withColumn("topic", router.resolveColumn(org.apache.spark.sql.functions.lit("public"), $"t"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    names.foreach { n =>
      assert(got(n) == router.resolve("public", n), s"mismatch for $n")
    }
  }
}

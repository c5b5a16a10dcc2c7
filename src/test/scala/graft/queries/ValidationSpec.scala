package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q115 replica checksum: the properties that make it a migration
  * validator — order insensitivity, and single-row divergence localized
  * to exactly its bucket.
  */
class ValidationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sums(d: String): Map[Long, (Long, Long)] =
    Validation.q115ReplicaChecksum(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("checksum is invariant under row order and partitioning") {
    import spark.implicits._
    val base = sums(dir)
    val tmp = Files.createTempDirectory("graft-ck").toString
    graft.sources.Tables.load(spark, dir, "lineitem")
      .orderBy(rand(7))          // scramble order
      .repartition(7)            // and partitioning
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    assert(sums(tmp) == base)
  }

  test("q118: skyline equals the brute-force dominance test on real data") {
    import spark.implicits._
    val sky = Validation.q118Skyline(spark, dir)
      .select($"p_partkey").as[Long].collect().toSet
    val p = graft.sources.Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_size", $"p_retailprice")
    val brute = p.as("p").crossJoin(p.as("q"))
      .filter($"q.p_size" >= $"p.p_size" && $"q.p_retailprice" >= $"p.p_retailprice" &&
        ($"q.p_size" > $"p.p_size" || $"q.p_retailprice" > $"p.p_retailprice"))
      .select($"p.p_partkey").distinct().as[Long].collect().toSet
    val all = p.select($"p_partkey").as[Long].collect().toSet
    assert(sky == (all -- brute) && sky.nonEmpty)
  }

  test("q118: equal frontier pairs are both kept; dominated same-size rows drop") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sky").toString
    Seq(
      (1L, "a", 10, 100.0),  // frontier (largest size, top price there)
      (2L, "b", 10, 100.0),  // identical pair: mutually non-dominating
      (3L, "c", 10, 90.0),   // same size, lower price: dominated by 1/2
      (4L, "d", 5, 120.0),   // smaller size but pricier: frontier
      (5L, "e", 5, 120.0),   // its duplicate
      (6L, "f", 3, 110.0)    // dominated by (5, 120)
    ).toDF("p_partkey", "p_name", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = Validation.q118Skyline(spark, tmp)
      .select($"p_partkey").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 4L, 5L))
  }

  test("a single corrupted row flips exactly its own bucket") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ck2").toString
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    li.withColumn("l_quantity",
        when($"l_orderkey" === 5 && $"l_linenumber" === 1,
          $"l_quantity" + 1).otherwise($"l_quantity"))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val base = sums(dir)
    val bad = sums(tmp)
    val diff = base.keySet.filter(b => base(b) != bad(b))
    assert(diff == Set(5L % 16))               // localized to one bucket
    assert(base(5L)._2 == bad(5L)._2)          // counts agree: content drift
  }

  test("q137: null and distinct accounting on a hand-built table") {
    import spark.implicits._
    // the profiler adapts to whatever schema it reads — a 3-column
    // fixture with planted nulls and duplicates has known answers
    val tmp = Files.createTempDirectory("graft-prof").toString
    Seq((Some(1L), Some("x"), Some(1.5)),
        (Some(1L), None,      Some(1.5)),
        (Some(2L), Some("y"), None),
        (None,     Some("y"), Some(2.5)))
      .toDF("k", "s", "v")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Validation.q137Profile(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "k" -> ((4L, 1L, 2L)),
      "s" -> ((4L, 1L, 2L)),
      "v" -> ((4L, 1L, 2L))))
  }

  test("q210: reconciliation counts exactly the drifting and childless orders") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-recon").toString
    // order 1 reconciles exactly; order 2 drifts by +1.00; order 3 has no lines
    Seq(
      (1L, 1L, "O", 110.00),
      (2L, 1L, "O", 100.00),
      (3L, 1L, "F", 50.00)
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(
      (1L, 1, 100.00, 0.00, 0.10), // 100 * 1.0 * 1.1 = 110.00
      (2L, 1, 101.00, 0.00, 0.00)  // 101.00 vs header 100.00
    ).toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Validation.q210Reconcile(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("O") == ((2L, 1L, 1.0)))   // one clean, one 1.00 drift
    assert(got("F")._1 == 1L && got("F")._2 == 1L && got("F")._3 == 50.0)
  }
}

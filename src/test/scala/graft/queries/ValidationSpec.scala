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
}

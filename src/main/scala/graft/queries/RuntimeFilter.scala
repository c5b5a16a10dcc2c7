package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain
import graft.sources.Tables
import Exact._

/** Explicit row-level runtime filtering — the "sideways information
  * passing" pattern for big-to-big joins: when the build side is too
  * large to broadcast as a hash relation (Spark's broadcast threshold)
  * but its KEY SET fits as a bloom filter (~1.2 bytes/key at 1% FPR),
  * aggregate a bloom over the build keys once, ship it to every
  * probe-side task, and drop non-joining probe rows BEFORE they pay the
  * join shuffle. Spark's optimizer injects the same thing when
  * `runtime.bloomFilter.enabled` fires, but only under its own
  * selectivity heuristics; this operator lets the user place the filter
  * deliberately — the difference between shuffling 100 TB of lineitem
  * and shuffling the ~20% that joins.
  *
  * Losslessness: the bloom admits false positives (eliminated by the
  * exact join that follows) and NO false negatives — so
  * `bloom-prefilter → exact semi join` returns exactly the plain semi
  * join's rows, and the plain semi join IS the oracle.
  */
object RuntimeFilter {

  /** q160: revenue summary of lineitems whose order is URGENT-priority,
    * executed as bloom-prefilter → exact shuffled semi join → aggregate.
    * The bloom is built by ONE distributed pass over the (filter-pushed)
    * build keys (`stat.bloomFilter` merges per-partition blooms by OR);
    * the probe scan evaluates one codegen'd `bloom_might_contain` per
    * row, so ~80% of lineitem never enters the join exchange. The
    * preceding `build.count()` sizes the filter (at 100 TB you'd read
    * this from table stats instead — one cheap metadata-or-scan job
    * either way, amortized against the shuffle it shrinks).
    */
  def q160BloomJoin(s: SparkSession, dir: String, fpp: Double = 0.01): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val build = Tables.load(s, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val nKeys = math.max(build.count(), 1L)
    val bloom = build.stat.bloomFilter("o_orderkey", nKeys, fpp)
    val bytes = BloomMightContain.serialize(bloom)
    val li = Tables.load(s, dir, "lineitem")
      .filter(call_function("bloom_might_contain", $"l_orderkey", lit(bytes)))
    li.join(build, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(d2($"l_extendedprice")).cast("double").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  val q160BloomJoinSql: String =
    s"""SELECT l_returnflag,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  ${sqlDsum("l_extendedprice")} AS sum_price
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}

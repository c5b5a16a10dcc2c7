package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The boundedPrefix contract: the distributed prefix equals the
  * single-node answer, and the unpartitioned-window guard makes a
  * data-sized frame fail LOUDLY (the q294/q148/q164b plan-audit
  * property, now asserted at runtime instead of argued per site).
  */
class PrefixSpec extends SparkSpec {

  test("global row_number via boundedPrefix equals the single-node rank " +
    "for every row, across partition boundaries") {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    // adversarial: heavy duplicates + a skewed head, 8 range partitions
    val rows = (1 to 500).map(i => ((i * 7919) % 97).toLong -> i.toLong)
    val df = rows.toDF("k", "id")
    val (ranged, offsets) = Prefix.boundedPrefix(df, 8, lit(1L), $"k".asc, $"id".asc)
    val got = ranged
      .withColumn("rn", row_number().over(
        W.partitionBy($"pid").orderBy($"k", $"id")).cast("long"))
      .join(broadcast(offsets), "pid")
      .select($"k", $"id", ($"rn" + $"off").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.sorted.zipWithIndex.map { case (kv, i) => kv -> (i + 1).toLong }.toMap
    assert(got == want)
  }

  test("weighted offsets give the exact global cumulative (the q294 median shape)") {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val rows = (1 to 200).map(i => (i.toLong % 37, (i % 5 + 1).toLong))
    val df = rows.toDF("v", "c").groupBy($"v").agg(sum($"c").as("c"))
    val (ranged, offsets) = Prefix.boundedPrefix(df, 8, $"c", $"v".asc)
    val got = ranged
      .withColumn("cum", sum($"c").over(W.partitionBy($"pid").orderBy($"v")))
      .join(broadcast(offsets), "pid")
      .select($"v", ($"cum" + $"off").as("gcum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grouped = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val want = grouped.zip(grouped.scanLeft(0L)(_ + _._2).tail)
      .map { case ((v, _), cum) => v -> cum }.toMap
    assert(got == want)
  }

  test("a data-sized frame through the unpartitioned prefix window fails " +
    "loudly, naming the contract") {
    import spark.implicits._
    // 100 'partition totals' against a bound of 32: a caller that fed
    // per-KEY counts (data-sized) instead of per-PARTITION counts
    val bogus = (0 until 100).map(i => (i, 1L)).toDF("pid", "pn")
    val ex = intercept[Exception] {
      Prefix.offsetsOf(bogus, 32).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("boundedPrefix")), ex.getMessage)
  }
}

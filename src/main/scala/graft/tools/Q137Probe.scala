package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B adjudication probe for q137's per-column profile (r16
  * optimization round): the 11-distinct-aggregate single `agg` plans as
  * one ×12 Expand feeding a two-level hash aggregate over every column
  * at once; the alternative is a UNION of 11 per-column aggregates,
  * each a (value)-keyed partial-distinct + 1-row rollup reading ONE
  * parquet column. Interleaved A B A B on one session so machine drift
  * cannot masquerade as a plan delta (the Q230Probe discipline).
  * Usage: runMain graft.tools.Q137Probe [sfDir] [reps]
  */
object Q137Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the PRE-r16 spelling, inlined verbatim so the probe stays a valid
    // A/B even after q137 switched to the union shape (adjudicated:
    // expand ~4.7 s vs union ~1.4 s at sf0.1, interleaved, equal rows)
    def expand(): DataFrame = {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      val cols = li.columns.sorted
      val aggs = cols.flatMap { c => Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct")) }
      li.agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(explode(array(cols.map(c => struct(
            lit(c).as("column"), $"n_rows",
            col(s"${c}__nulls").as("n_null"),
            col(s"${c}__distinct").as("n_distinct"))): _*)).as("p"))
        .select($"p.column", $"p.n_rows", $"p.n_null", $"p.n_distinct")
        .orderBy($"column")
    }

    def unioned(): DataFrame = {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      val cols = li.columns.sorted
      cols.map { c =>
        li.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          .agg(sum($"cnt").as("n_rows"),
            sum(when($"v".isNull, $"cnt").otherwise(0L)).as("n_null"),
            sum(when($"v".isNotNull, 1L).otherwise(0L)).as("n_distinct"))
          .select(lit(c).as("column"), $"n_rows", $"n_null", $"n_distinct")
      }.reduce(_ unionAll _).orderBy($"column")
    }

    def time(tag: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both once (JIT, footer caches), then interleave
    time("warm expand")(expand()); time("warm union")(unioned())
    (1 to reps).foreach { i =>
      time(s"expand#$i")(expand()); time(s"union#$i")(unioned())
    }
    // equality audit: same rows
    val a = expand().collect().map(_.toString).sorted
    val b = unioned().collect().map(_.toString).sorted
    println("equal: " + a.sameElements(b))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Clean-session single-query timer — the contention-free counterpart
  * of the full `graft.Bench` suite, for auditing whether a suite
  * outlier is a real plan cost or GC/contention amplification (the
  * BENCH_SCALING discipline: every >10x scaling ratio gets one of
  * these runs before it is believed). Warm-up write + timed write per
  * query on a fresh `local[32]` session. Usage:
  *   runMain graft.tools.QBench <sfDir> <query> [query ...]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    args.drop(1).foreach(q => time(q)(graft.SparkEntry.queries(q)(spark, dir)))
    spark.stop()
  }
}

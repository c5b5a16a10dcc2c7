package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Time individual registered queries in isolation (the bench runs the
  * whole suite; this is the single-query iteration loop). Usage:
  *   runMain graft.tools.Time [sfDir] [attempts] [query ...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val attempts = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.drop(2).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        val times = (1 to attempts).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name: min ${times.min}%.3f  all ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}

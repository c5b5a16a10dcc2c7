package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Dedup

// Temporary dev probe — timing + recall check for the native-signature
// rewrite of q41/q42 at sf0.1. Deleted before round end.
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df
    }
    val q40 = time("q40")(Dedup.q40NgramJaccard(spark, dir))
    val q41 = time("q41")(Dedup.q41MinhashLsh(spark, dir))
    val q42 = time("q42")(Dedup.q42Simhash(spark, dir))
    val p40 = q40.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p41 = q41.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p42 = q42.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"RECALL q41: ${p41.size}/${p40.size} exact=${p41 == p40} missed=${(p40 -- p41).take(5)}")
    println(s"RECALL q42: ${p42.size}/${p40.size} exact=${p42 == p40} missed=${(p40 -- p42).take(5)}")
    spark.stop()
  }
}

package graft.tools
// Temporary stage-decomposition probe for the q148 derived-decade
// adjudication; not part of the library surface.
import org.apache.spark.sql.SparkSession
object SnmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val stages = graft.queries.Dedup.snmStages(spark, dir)
    t("rank stage")(stages._1.count())
    println("cands: " + t("cands")(stages._2.count()))
    println("filtered: " + t("filtered")(stages._3.count()))
    println("verified: " + t("verify")(stages._4.count()))
    spark.stop()
  }
}

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
    import graft.queries.Similarity
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    // exact q43 ground truth (the old crossJoin form) vs bucketed q43
    val e = Tables.load(spark, dir, "embeddings")
    graft.GraftExtensions.register(spark)
    val exact = e.select(col("vec_id").as("d1"), col("embedding").as("x"))
      .crossJoin(broadcast(e.select(col("vec_id").as("d2"), col("embedding").as("y"))))
      .filter(col("d1") < col("d2"))
      .withColumn("cos_sim", call_function("cosine_similarity", col("x"), col("y")))
      .filter(col("cos_sim") >= 0.45)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q43 = time("q43")(Similarity.q43EmbedNearDup(spark, dir))
    val p43 = q43.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"RECALL q43: ${p43.size}/${exact.size} exact=${p43 == exact} missed=${(exact -- p43).take(5)}")
    // q51 recall at nprobe=2 vs brute
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(time("q50")(Similarity.q50AnnBrute(spark, dir)))
    val ivf = pairs(time("q51")(Similarity.q51AnnIvf(spark, dir)))
    println(s"RECALL q51@nprobe2: ${(truth & ivf).size.toDouble / truth.size}")
    spark.stop()
  }
}

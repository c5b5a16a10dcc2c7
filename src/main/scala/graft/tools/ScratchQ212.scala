package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ScratchQ212 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val en = e.select($"vec_id", $"embedding", $"label",
      sqrt(call_function("dot_product", $"embedding", $"embedding")).as("nrm"))
    val q = en.select($"vec_id".as("qid"), $"embedding".as("qe"),
      $"label".as("true_label"), $"nrm".as("qn"))
    def pairs = en.select($"vec_id".as("nid"), $"embedding".as("ne"),
        $"label".as("nlabel"), $"nrm".as("nn"))
      .crossJoin(broadcast(q))
      .filter($"nid" =!= $"qid")
      .withColumn("cos_sim",
        when($"qn" === 0.0 || $"nn" === 0.0, lit(0.0))
          .otherwise(call_function("dot_product", $"qe", $"ne") / ($"qn" * $"nn")))
      .select($"qid", $"true_label", $"nid", $"nlabel", $"cos_sim")
    def t(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid")
    def topk = pairs.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
    // warm
    t("warm pairs-only")(pairs)
    t("pairs-only#1")(pairs)
    t("pairs-only#2")(pairs)
    t("topk#1")(topk)
    t("topk#2")(topk)
    t("full q212#1")(graft.queries.Similarity.q212KnnEval(spark, dir))
    t("full q212#2")(graft.queries.Similarity.q212KnnEval(spark, dir))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-cost probe that adjudicated q212's r16 rework: times the
  * narrow candidate pass (BNLJ + per-pair dot, norms precomputed)
  * alone, then with the row_number window top-k on top, then the full
  * registered lane — one session, repeated writes, so the window's
  * local-sort cost is isolated from machine drift. Measured at sf0.1:
  * pairs-only ~2.0 s, +window ~+4 s, full lane ≈ topk + 0.2 s — the
  * finding that motivated the sort-free KnnVote aggregate (the lane
  * then reads ~3.6 s warm). The `topk` spelling below is the PRE-r16
  * window form, kept as the A/B baseline.
  * Usage: runMain graft.tools.Q212Probe
  */
object Q212Probe {
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

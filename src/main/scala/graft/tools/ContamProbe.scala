package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.TextOps

/** Decade-adjudication probe for the contamination-scoring lanes
  * (q278 BLEU / q279 chrF): the registered `doc_id % 50` eval contract
  * grows the eval set WITH the corpus, so a derived decade multiplies
  * BOTH the pair count and the eval side — overstating the scaling a
  * deployment sees, where the benchmark suite is FIXED while the
  * corpus grows. This probe times each lane twice on the same session:
  * uncapped (the registered contract) and eval-capped to the SOURCE
  * copy's ids (deployment shape: 10× corpus, fixed eval set — derived
  * copies' ids sit above `cap`, and copy vocabularies are disjoint so
  * capped pairs equal the source scale's pairs exactly). Usage:
  *   runMain graft.tools.ContamProbe <sfDir> [capDocId]
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1d")
    val cap = args.lift(1).map(_.toLong).getOrElse(999999999L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min ${ts.min}%.2f s  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("q278 uncapped (registered: eval grows with corpus)") {
      TextOps.q278BleuContamination(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time(s"q278 eval<=cap (deployment: fixed eval set)") {
      TextOps.q278BleuContamination(spark, dir, cap)
        .write.format("noop").mode("overwrite").save()
    }
    time("q279 uncapped (registered: eval grows with corpus)") {
      TextOps.q279ChrfContamination(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time(s"q279 eval<=cap (deployment: fixed eval set)") {
      TextOps.q279ChrfContamination(spark, dir, cap)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

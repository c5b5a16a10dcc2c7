package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KnnVote must reproduce the sort-based window spelling's prediction
  * exactly: top-k by (cos DESC, nid ASC) — including TIED cosines —
  * then majority label with ties to the smallest label.
  */
class KnnVoteSpec extends SparkSpec {

  test("equals the row_number + vote-argmax spelling, incl. tied scores " +
    "and groups smaller than k") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // coarse score grid => frequent exact ties; labels from a small set
    val rows = (1 to 20000).map { i =>
      (i % 503L, // qid
        (i % 211).toLong + 100000L, // nid
        rnd.nextInt(5), // nlabel
        math.floor(rnd.nextDouble() * 20) / 20.0) // cos with ties
    } ++ Seq((9999L, 1L, 3, 0.5)) // a 1-candidate group (< k)
    val df = rows.toDF("qid", "nid", "nlabel", "cos_sim")
      .filter($"nid" =!= $"qid")
      // the real lane dedups (qid, nid) implicitly (one row per pair);
      // make the fixture match so both spellings see identical input
      .groupBy($"qid", $"nid").agg(first($"nlabel").as("nlabel"),
        first($"cos_sim").as("cos_sim"))

    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid")
    val want = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .groupBy($"qid", $"nlabel").agg(count(lit(1)).as("votes"))
      .groupBy($"qid")
      .agg(max(struct($"votes", (-$"nlabel").as("neg"))).as("win"))
      .select($"qid", (-$"win.neg").as("pred"))

    val knn = udaf(KnnVote.aggregator(3))
    val got = df.groupBy($"qid")
      .agg(knn($"cos_sim", $"nid", $"nlabel").as("pred"))

    val diff = got.join(want, Seq("qid"))
      .filter(got("pred") =!= want("pred"))
    assert(diff.isEmpty, diff.take(5).mkString)
    assert(got.count() === want.count())
  }
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q281 winnowing: the paper's guarantee and tie rule, pinned on
  * constructed corpora, plus the partitioned-window plan law.
  */
class WinnowingSpec extends SparkSpec {

  private def fingerprints(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-winnow").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    TextOps.q281Winnowing(spark, tmp).as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rows) =>
        (d, rows.map(r => (r._2, r._3)).toSet)
      }
  }

  test("the winnowing guarantee: a shared substring of length >= w+k-1 = 8 " +
    "yields a shared fingerprint hash") {
    val shared = "xqzvbnmkw"  // 9 chars, no spaces
    val fps = fingerprints(Seq(
      (1L, s"aaaa bbbb $shared cccc dddd"),
      (2L, s"eeee ffff gggg $shared hhhh")))
    val h1 = fps(1L).map(_._1)
    val h2 = fps(2L).map(_._1)
    assert((h1 & h2).nonEmpty,
      s"docs sharing '$shared' must share a fingerprint: $h1 vs $h2")
  }

  test("rightmost-min tie rule: an all-equal-hash run selects every window's " +
    "RIGHT edge, not its left") {
    // 12 identical chars -> 8 identical 5-gram hashes; windows (rn>=4)
    // end at gram positions 3..7 and the rightmost rule selects the
    // window's newest gram each time
    val fps = fingerprints(Seq((1L, "aaaaaaaaaaaa")))
    assert(fps(1L).map(_._2) == Set(3L, 4L, 5L, 6L, 7L))
  }

  test("short documents (< w+k-1 stripped chars) select nothing; density is " +
    "bounded by the window count") {
    val fps = fingerprints(Seq(
      (1L, "ab cd e"),                  // 5 stripped chars < 8
      (2L, "abcdefghijklmnopqrstuvwxyz")))
    assert(!fps.contains(1L))
    val n = fps(2L).size
    assert(n >= 1 && n <= 26 - 5 + 1 - 3, s"selected $n of the 19 windows")
  }

  test("q281's window is partitioned by doc — never a global window") {
    val df = graft.SparkEntry.queries("q281_winnowing")(
      spark, "/root/testdata/sf0.001")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"winnowing must window per doc:\n${df.queryExecution.optimizedPlan}")
  }
}

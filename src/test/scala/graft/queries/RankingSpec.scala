package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q82 BM25: ordering laws on a hand-built corpus where term frequency,
  * document length, and term rarity each vary in isolation, plus shape
  * checks on the real corpus.
  */
class RankingSpec extends SparkSpec {

  private def scores(dir: String): Map[Long, Float] =
    Ranking.q82Bm25(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getFloat(r.fieldIndex("score"))).toMap

  test("BM25 ordering: tf raises, length lowers, rarity outweighs a common term") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bm25").toString
    val docs = Seq(
      (0L, "dup z z z"),         // tf_dup=1, dl=4
      (1L, "spark z z z"),       // tf_spark=1, dl=4 — common term
      (2L, "dup dup z z"),       // tf_dup=2, dl=4
      (3L, "dup z z z z z z z"), // tf_dup=1, dl=8
      (4L, "z z z z")            // no query terms
    ) ++ (5L to 14L).map(i => (i, "spark z")) // make df_spark >> df_dup
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sc = scores(tmp)
    assert(sc(4L) == 0f)            // no term hit scores exactly zero
    assert(sc(2L) > sc(0L))          // more occurrences rank higher
    assert(sc(0L) > sc(3L))          // same tf, longer doc ranks lower
    assert(sc(0L) > sc(1L))          // rare term beats common at same tf/dl
  }

  test("real corpus: top-k is sorted, finite, and only term-bearing docs score") {
    val rows = Ranking.q82Bm25(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    val sc = rows.map(_.getFloat(rows.head.fieldIndex("score")))
    assert(sc.forall(s => !s.isNaN && !s.isInfinite && s > 0))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    // every scored doc carries at least one query term occurrence
    rows.foreach { r =>
      val tf = r.getLong(r.fieldIndex("tf_dup")) +
        r.getLong(r.fieldIndex("tf_spark")) + r.getLong(r.fieldIndex("tf_key"))
      assert(tf > 0)
    }
  }

  test("q216: decayed score is bounded by the total and exact when all mass is newest-day") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    Ranking.q216DecayedTrend(spark, dir).collect().foreach { r =>
      val sc = r.getAs[Float]("decayed_score").toDouble
      assert(sc > 0 && sc <= r.getAs[Long]("total").toDouble + 1e-6)
    }
    // fixture: 'now' has all its events on the newest day (score == total);
    // 'old' has the same count 10 days earlier (score == total * e^-1)
    val tmp = Files.createTempDirectory("graft-decay").toString
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    (Seq.tabulate(4)(i => (i.toLong, ts("2024-01-11 10:00:00"), 1L, "now", 0.0, "{}")) ++
     Seq.tabulate(4)(i => (10L + i, ts("2024-01-01 10:00:00"), 1L, "old", 0.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Ranking.q216DecayedTrend(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getAs[Float]("decayed_score").toDouble).toMap
    assert(got("now") == 4.0)
    assert(math.abs(got("old") - 4.0 * math.exp(-1.0)) < 1e-5)
  }

  test("q200: at most 5 keywords per doc, scores non-increasing, every keyword occurs") {
    val dir = "/root/testdata/sf0.001"
    val rows = Ranking.q200TopkKeywords(spark, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      assert(rs.length <= 5)
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to rs.length).toSeq)
      val scores = sorted.map(_.getAs[Float]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(rs.forall(_.getAs[Long]("tf") > 0))
    }
    // spot-check membership: each keyword really occurs in its document
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.take(50).foreach { r =>
      val words = texts(r.getLong(0)).split(" ")
      assert(words.contains(r.getAs[String]("keyword")))
    }
  }

  test("q239: mined negatives are lexically close but never positives — " +
    "each contains some query terms, none contains all") {
    val dir = "/root/testdata/sf0.001"
    val queries = Map(
      "dup+key"    -> Seq("dup", "key"),
      "dup+vector" -> Seq("dup", "vector"),
      "fast+line"  -> Seq("fast", "line"))
    val rows = Ranking.q239HardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.groupBy(_.getAs[String]("qid")).foreach { case (qid, rs) =>
      assert(rs.length <= 10)
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to rs.length).toSeq)
      val scores = sorted.map(_.getAs[Float]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      val terms = queries(qid)
      rs.foreach { r =>
        val words = texts(r.getAs[Long]("doc_id")).split(" ").toSet
        val present = terms.count(words.contains)
        // the defining hard-negative property, checked against raw text
        assert(present == r.getAs[Long]("n_present"))
        assert(present > 0 && present < terms.length,
          s"$qid doc ${r.getAs[Long]("doc_id")}: $present of ${terms.length}")
      }
    }
  }
}

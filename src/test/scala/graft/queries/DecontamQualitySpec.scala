package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q111 semantic decontamination + q112 quality model: hand-built
  * fixtures where contamination and scores are computable by hand.
  */
class DecontamQualitySpec extends SparkSpec {

  test("q111: a duplicate of an eval vector flags; an orthogonal one does not") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-semdecon").toString
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),  // eval (vec_id % 20 == 0)
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f), 0),  // same direction: cos = 1
      (2L, Array(0.0f, 3.0f, 0.0f, 0.0f), 0),  // orthogonal: cos = 0
      (3L, Array(1.0f, 1.0f, 0.0f, 0.0f), 0)   // 45 degrees: cos ~ 0.707 > 0.6
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.q111SemanticDecontam(spark, tmp).collect()
    val m = rows.map(r => r.getLong(0) ->
      (r.getDouble(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(!m.contains(0L))                  // eval side never scored
    assert(m(1L)._3 && m(1L)._1 == 1.0 && m(1L)._2 == 1L)
    assert(!m(2L)._3 && m(2L)._1 == 0.0 && m(2L)._2 == 0L)
    assert(m(3L)._3)                         // paraphrase-distance leak caught
  }

  test("q117: reciprocal rank and precision@4 on a hand-ranked neighborhood") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-receval").toString
    // query 0 (label 9); cosine to (1,0) strictly decreases with t in
    // (1,t): ranks are 1..5 in listed order. First relevant at rank 2.
    Seq(
      (0L,   Array(1.0f, 0.0f),  9),
      (1L,   Array(1.0f, 0.1f),  5),   // rank 1, irrelevant
      (2L,   Array(1.0f, 0.2f),  9),   // rank 2, relevant -> rr = 1/2
      (3L,   Array(1.0f, 0.35f), 5),   // rank 3, irrelevant
      (4L,   Array(1.0f, 0.5f),  9),   // rank 4, relevant
      (5L,   Array(1.0f, 2.0f),  9)    // rank 5: outside k=4
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.q117RetrievalEval(spark, tmp).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getInt(1) == 9)
    assert(r.getDouble(r.fieldIndex("reciprocal_rank")) == 0.5)
    assert(r.getLong(r.fieldIndex("n_relevant")) == 2L)
    assert(r.getDouble(r.fieldIndex("precision_at_k")) == 0.5)
  }

  test("q112: logistic score matches a hand computation and orders by lexicon density") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-qmodel").toString
    Seq(
      (1L, "table row value query"),   // all-lexicon, all-distinct
      (2L, "zz zz zz zz")              // no lexicon, 1 distinct of 4
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val rows = LangModel.q112QualityModel(spark, tmp).collect()
    val m = rows.map(r => r.getLong(0) ->
      (r.getFloat(r.fieldIndex("quality_score")),
        r.getBoolean(r.fieldIndex("keep")))).toMap
    def sigmoid(nTok: Long, nDist: Long, nLex: Long, nChars: Long): Double = {
      val z = -2.0 + 0.35 * math.log(nTok.toDouble) +
        2.0 * (nDist.toDouble / nTok) + 1.5 * (nLex.toDouble / nTok) +
        0.05 * (nChars.toDouble / nTok)
      1.0 / (1.0 + math.exp(-z))
    }
    assert(m(1L)._1 == sigmoid(4, 4, 4, 18).toFloat)
    assert(m(2L)._1 == sigmoid(4, 1, 0, 8).toFloat)
    assert(m(1L)._1 > m(2L)._1)
    assert(m(1L)._2 && !m(2L)._2)  // hand-checked: z1 > 0, z2 < 0
  }
}

package graft.queries

import graft.SparkSpec

/** Multimodal plumbing: schema contract, partition-parallel batched
  * decode (stub codec), frame sampling, and payload-size bookkeeping.
  */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media table has the binary+metadata schema contract") {
    val m = Multimodal.mediaTable(spark, dir)
    val f = m.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("payload") == "binary")
    assert(f("modality") == "string" && f("width") == "integer" && f("durationMs") == "long")
    assert(m.select("modality").distinct().count() == 3)
  }

  test("feature extraction is deterministic, partition-parallel, and dimension-stable") {
    val m = Multimodal.mediaTable(spark, dir).repartition(4)
    val feats = Multimodal.extractFeatures(m).collect()
    assert(feats.length == m.count())
    assert(feats.forall(_.featureDim == Multimodal.StubCodec.FeatureDim))
    // histogram features sum to ~1 (normalized over payload bytes)
    assert(feats.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    // deterministic across runs
    val again = Multimodal.extractFeatures(m).collect()
    assert(feats.sortBy(_.mediaId).zip(again.sortBy(_.mediaId))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling shrinks payloads by the sampling factor") {
    val m = Multimodal.mediaTable(spark, dir)
    val sampled = Multimodal.sampleFrames(m, everyNth = 4)
    val sizes = m.selectExpr("mediaId", "length(payload) AS n")
      .join(sampled.selectExpr("mediaId", "length(payload) AS ns"), "mediaId")
      .collect()
    assert(sizes.forall(r => r.getAs[Int]("ns") == (r.getAs[Int]("n") + 3) / 4))
  }

  test("resize caps width, scales height and payload together, passes small media through") {
    val m = Multimodal.mediaTable(spark, dir)
    val resized = Multimodal.resize(m, maxWidth = 256)
    val joined = m.selectExpr("mediaId", "width AS w0", "height AS h0", "length(payload) AS n0")
      .join(resized.selectExpr(
        "mediaId", "width AS w1", "height AS h1", "length(payload) AS n1"), "mediaId")
      .collect()
    assert(joined.nonEmpty && joined.exists(_.getAs[Int]("w0") > 256))
    joined.foreach { r =>
      val (w0, h0, n0) = (r.getAs[Int]("w0"), r.getAs[Int]("h0"), r.getAs[Int]("n0"))
      val (w1, h1, n1) = (r.getAs[Int]("w1"), r.getAs[Int]("h1"), r.getAs[Int]("n1"))
      if (w0 <= 256) assert((w1, h1, n1) == ((w0, h0, n0)), s"media ${r.getLong(0)} must pass through")
      else {
        assert(w1 == 256)
        assert(h1 == math.max(h0 * 256 / w0, 1), s"height must track the width scale")
        assert(n1 == math.max(n0 * 256 / w0, 1), s"payload must scale with the dimensions")
      }
    }
  }
}

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
}

package graft.functions

import org.apache.spark.sql.functions.{broadcast, call_function, lit, typedLit}

import graft.GraftExtensions
import graft.SparkSpec

/** PQ codec expressions: encode/LUT/ADC consistency with each other and
  * with the exact cosine they approximate, codegen/eval agreement, and
  * edge behavior.
  */
class ProductQuantizerSpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); GraftExtensions.register(spark) }

  private val dir = "/root/testdata/sf0.001"
  private val M = 8
  private val K = 16

  private def embeddings = graft.sources.Tables.load(spark, dir, "embeddings")

  test("codes are in range and deterministic across runs") {
    import spark.implicits._
    val cb = typedLit(graft.queries.Similarity.trainPqCodebook(embeddings, M, K))
    def codesDf = embeddings.select($"vec_id",
      call_function("pq_encode", $"embedding", cb, lit(M), lit(K)).as("codes"))
    val once = codesDf.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(once.nonEmpty)
    assert(once.values.forall(c => c.length == M && c.forall(j => j >= 0 && j < K)))
    val again = codesDf.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(once == again)
  }

  test("pq_adc(lut, codes) equals the direct codebook dot-product sum") {
    import spark.implicits._
    val flat = graft.queries.Similarity.trainPqCodebook(embeddings, M, K)
    val cb = typedLit(flat)
    val subDim = flat.length / (M * K)
    val rows = embeddings.limit(20)
      .select($"vec_id",
        call_function("pq_encode", $"embedding", cb, lit(M), lit(K)).as("codes"),
        call_function("pq_lut", $"embedding", cb, lit(M), lit(K)).as("lut"),
        call_function("pq_adc",
          call_function("pq_lut", $"embedding", cb, lit(M), lit(K)),
          call_function("pq_encode", $"embedding", cb, lit(M), lit(K))).as("self_adc"),
        $"embedding")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      val lut = r.getSeq[Double](2)
      assert(lut.length == M * K)
      val manual = (0 until M).map(sub => lut(sub * K + codes(sub))).sum
      assert(r.getDouble(3) == manual) // exact: same summation order
      // self-ADC approximates the vector's own cosine (= 1) from its
      // reconstruction. On isotropic random data k-means centroids shrink
      // hard toward 0 (a k=16 cell of random 8-dim sub-vectors averages
      // mostly noise away), so the reconstruction dot sits well below 1 —
      // but it must stay clearly positive: the vector's own cell centroid
      // points its way. Clustered real embeddings reconstruct far higher.
      assert(r.getDouble(3) > 0.15, s"self_adc=${r.getDouble(3)}")
      val _ = subDim
    }
  }

  test("interpreted eval matches codegen output exactly") {
    import spark.implicits._
    val cb = typedLit(graft.queries.Similarity.trainPqCodebook(embeddings, M, K))
    val df = embeddings.select($"vec_id",
      call_function("pq_encode", $"embedding", cb, lit(M), lit(K)).as("codes"),
      call_function("pq_lut", $"embedding", cb, lit(M), lit(K)).as("lut"))
    val codegen = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2))).sortBy(_._1)
    val interp = withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.collect().map(r =>
        (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2))).sortBy(_._1)
    }
    assert(codegen.toSeq == interp.toSeq)
  }

  private def withSqlConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("ADC score orders true neighbors above average: rank correlation with exact cosine") {
    import spark.implicits._
    val cb = typedLit(graft.queries.Similarity.trainPqCodebook(embeddings, M, K))
    val corpus = embeddings.select($"vec_id".as("nid"), $"embedding".as("ne"),
      call_function("pq_encode", $"embedding", cb, lit(M), lit(K)).as("codes"))
    val q = embeddings.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"),
        call_function("pq_lut", $"embedding", cb, lit(M), lit(K)).as("lut"),
        $"embedding".as("qe"))
    val scored = corpus.crossJoin(broadcast(q)).filter($"nid" =!= $"qid")
      .select($"qid", $"nid",
        call_function("pq_adc", $"lut", $"codes").as("adc"),
        call_function("cosine_similarity", $"qe", $"ne").as("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // Pearson correlation between ADC and exact cosine across all pairs —
    // the property that makes rerank-after-ADC work. Isotropic random
    // embeddings are PQ's worst case (quantization error is the same order
    // as the cosine spread itself; measured ~0.70 here), so the floor sits
    // at 0.6: far above chance, with slack for codebook drift.
    val n = scored.length.toDouble
    val (sx, sy) = (scored.map(_._2).sum, scored.map(_._3).sum)
    val (sxx, syy) = (scored.map(t => t._2 * t._2).sum, scored.map(t => t._3 * t._3).sum)
    val sxy = scored.map(t => t._2 * t._3).sum
    val corr = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(corr > 0.6, s"ADC/cosine correlation=$corr")
  }
}

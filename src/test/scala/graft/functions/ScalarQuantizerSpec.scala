package graft.functions

import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.functions.typedLit

import graft.GraftExtensions
import graft.SparkSpec

/** SQ8 codec expressions: code range/determinism, reconstruction error
  * bounded by the per-dimension grid step, codegen/eval agreement, and
  * the asymmetric cosine's fidelity to the exact cosine.
  */
class ScalarQuantizerSpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); GraftExtensions.register(spark) }

  private val dir = "/root/testdata/sf0.001"
  private def embeddings = graft.sources.Tables.load(spark, dir, "embeddings")

  test("codes are one byte per dimension and deterministic") {
    import spark.implicits._
    val (mins, scales) = graft.queries.Similarity.trainSq8(embeddings)
    assert(mins.length == 64 && scales.length == 64)
    def codesDf = embeddings.select($"vec_id",
      call_function("sq8_encode", $"embedding", typedLit(mins), typedLit(scales))
        .as("codes"))
    val once = codesDf.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(once.nonEmpty)
    assert(once.values.forall(_.length == 64))
    val again = codesDf.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(once == again)
  }

  test("dequantized values sit within half a grid step of the input") {
    import spark.implicits._
    val (mins, scales) = graft.queries.Similarity.trainSq8(embeddings)
    val rows = embeddings.limit(50).select($"embedding",
      call_function("sq8_encode", $"embedding", typedLit(mins), typedLit(scales))
        .as("codes")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val codes = r.getAs[Array[Byte]](1)
      v.indices.foreach { d =>
        val deq = mins(d).toDouble + (codes(d) & 0xFF).toDouble * scales(d).toDouble
        // the train sample is the whole sf0.001 corpus, so every value is
        // inside [min, max]: rounding error is at most scale/2 (+ float eps)
        assert(math.abs(deq - v(d)) <= scales(d) / 2.0 + 1e-6,
          s"dim $d: v=${v(d)} deq=$deq scale=${scales(d)}")
      }
    }
  }

  test("interpreted eval matches codegen output exactly") {
    import spark.implicits._
    val (mins, scales) = graft.queries.Similarity.trainSq8(embeddings)
    val q = embeddings.limit(1).select($"embedding").collect().head.getSeq[Float](0).toArray
    val df = embeddings.select($"vec_id",
      call_function("sq8_encode", $"embedding", typedLit(mins), typedLit(scales)).as("codes"))
      .select($"vec_id", $"codes",
        call_function("sq8_cos", typedLit(q), $"codes",
          typedLit(mins), typedLit(scales)).as("approx"))
    val codegen = df.collect().map(r =>
      (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).sortBy(_._1)
    val interp = withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.collect().map(r =>
        (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).sortBy(_._1)
    }
    assert(codegen.toSeq == interp.toSeq)
  }

  test("sq8_cos tracks the exact cosine closely on real embeddings") {
    import spark.implicits._
    val (mins, scales) = graft.queries.Similarity.trainSq8(embeddings)
    val q = embeddings.filter($"vec_id" === 0L)
      .select($"embedding").collect().head.getSeq[Float](0).toArray
    val rows = embeddings.filter($"vec_id" =!= 0L).select($"embedding",
        call_function("sq8_cos", typedLit(q),
          call_function("sq8_encode", $"embedding", typedLit(mins), typedLit(scales)),
          typedLit(mins), typedLit(scales)).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val exact = {
        var dot = 0.0; var nq = 0.0; var nv = 0.0
        q.indices.foreach { d =>
          dot += q(d).toDouble * v(d); nq += q(d).toDouble * q(d); nv += v(d).toDouble * v(d)
        }
        dot / (math.sqrt(nq) * math.sqrt(nv))
      }
      // 8-bit uniform quantization over the observed range: tight
      assert(math.abs(r.getDouble(1) - exact) < 0.02,
        s"approx=${r.getDouble(1)} exact=$exact")
    }
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
}

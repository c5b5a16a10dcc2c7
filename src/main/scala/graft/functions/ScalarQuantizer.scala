package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Uniform 8-bit scalar quantization (the FAISS `IndexScalarQuantizer`
  * / SQ8 recipe re-expressed as native Catalyst expressions) — the
  * fourth ANN scale path alongside IVF (partitioning), SRP-LSH
  * (bucketing) and PQ (codebook compression): each DIMENSION maps
  * independently onto a 256-level uniform grid between its trained
  * min and max, so a dim-64 float vector (256 bytes) stores as 64 code
  * BYTES (4× smaller) with no codebook lookup in the scoring loop —
  * cheaper decode than PQ at a milder compression ratio, the standard
  * middle rung of the FAISS quantizer ladder.
  *
  * `sq8_encode` rides the corpus scan map-side (the signature
  * discipline: the 100 TB build is an embarrassingly parallel map);
  * `sq8_cos` is the pair-scoring hot loop — exact cosine between the
  * UNQUANTIZED query and the dequantized candidate (asymmetric
  * scoring, like PQ's ADC: only the stored side pays quantization
  * error). Both generate straight-line JVM loops via a static helper
  * call, keeping the whole projection inside whole-stage codegen. The
  * per-dimension (min, scale) train-time constants travel as codegen
  * reference objects — never a shuffle, never a join.
  */
object ScalarQuantizer {

  /** Per-dimension (mins, scales) from a training sample: scale =
    * (max − min)/255, degenerate dimensions (max == min) get scale 1
    * so every value quantizes to code 0 and dequantizes to min —
    * exact. Driver-side, on a BOUNDED sample (the codebook-training
    * discipline).
    */
  def train(sample: Array[Array[Float]], dim: Int): (Array[Float], Array[Float]) = {
    val mins = Array.fill(dim)(Float.MaxValue)
    val maxs = Array.fill(dim)(Float.MinValue)
    sample.foreach { v =>
      var d = 0
      while (d < math.min(v.length, dim)) {
        if (v(d) < mins(d)) mins(d) = v(d)
        if (v(d) > maxs(d)) maxs(d) = v(d)
        d += 1
      }
    }
    val scales = Array.tabulate(dim) { d =>
      if (mins(d) == Float.MaxValue) { mins(d) = 0f; 1f } // empty sample
      else if (maxs(d) > mins(d)) (maxs(d) - mins(d)) / 255f
      else 1f
    }
    (mins, scales)
  }

  /** Quantize: code_d = round((x_d − min_d)/scale_d) clamped to
    * [0, 255], stored as one byte. Deterministic (rint ties-to-even on
    * exact doubles).
    */
  def encodeBytes(arr: ArrayData, mins: Array[Float], scales: Array[Float]): Array[Byte] = {
    val dim = mins.length
    val out = new Array[Byte](dim)
    val n = math.min(arr.numElements(), dim)
    var d = 0
    while (d < n) {
      val u = Math.rint((arr.getFloat(d) - mins(d)).toDouble / scales(d))
      val c = if (u < 0.0) 0 else if (u > 255.0) 255 else u.toInt
      out(d) = (c & 0xFF).toByte
      d += 1
    }
    out
  }

  /** Asymmetric cosine: full-precision query vs dequantized candidate
    * (`min_d + code_d·scale_d`), one fused loop for dot and both
    * norms.
    */
  def cosineBytes(q: ArrayData, codes: Array[Byte],
      mins: Array[Float], scales: Array[Float]): Double = {
    val dim = math.min(math.min(q.numElements(), codes.length), mins.length)
    var dot = 0.0; var nq = 0.0; var nc = 0.0
    var d = 0
    while (d < dim) {
      val x = q.getFloat(d).toDouble
      val y = mins(d).toDouble + (codes(d) & 0xFF).toDouble * scales(d).toDouble
      dot += x * y; nq += x * x; nc += y * y
      d += 1
    }
    if (nq == 0.0 || nc == 0.0) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nc))
  }
}

/** sq8_encode(vec, mins, scales): per-dimension 8-bit codes as BINARY
  * (one byte per dimension). mins/scales are train-time float-array
  * literals, unwrapped by the GraftExtensions builder.
  */
case class Sq8Encode(child: Expression, mins: Array[Float], scales: Array[Float])
    extends UnaryExpression {

  require(mins.length == scales.length && mins.nonEmpty,
    "sq8_encode: mins and scales must be equal-length and non-empty")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ScalarQuantizer.encodeBytes(input.asInstanceOf[ArrayData], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mn = ctx.addReferenceObj("sq8Mins", mins, "float[]")
      val sc = ctx.addReferenceObj("sq8Scales", scales, "float[]")
      s"${ev.value} = graft.functions.ScalarQuantizer.encodeBytes($arr, $mn, $sc);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sq8_cos(query, codes): exact cosine between a float query vector and
  * a dequantized SQ8 candidate — the scoring hot loop of an SQ8 scan.
  */
case class Sq8Cos(left: Expression, right: Expression,
    mins: Array[Float], scales: Array[Float]) extends BinaryExpression {

  require(mins.length == scales.length && mins.nonEmpty,
    "sq8_cos: mins and scales must be equal-length and non-empty")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_cos"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, binary), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ScalarQuantizer.cosineBytes(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Array[Byte]], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val mn = ctx.addReferenceObj("sq8Mins", mins, "float[]")
      val sc = ctx.addReferenceObj("sq8Scales", scales, "float[]")
      s"${ev.value} = graft.functions.ScalarQuantizer.cosineBytes($q, $codes, $mn, $sc);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Sq8Encode {
  val info: ExpressionInfo = new ExpressionInfo(classOf[Sq8Encode].getName, "sq8_encode")
}

object Sq8Cos {
  val info: ExpressionInfo = new ExpressionInfo(classOf[Sq8Cos].getName, "sq8_cos")
}

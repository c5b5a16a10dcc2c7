package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization codec (the FAISS PQ recipe re-expressed as
  * native Catalyst expressions), completing the ANN family: IVF
  * partitions the corpus, SRP-LSH buckets it, PQ COMPRESSES it — a
  * dim-64 float vector (256 bytes) becomes M sub-space code ids
  * (M bytes at k ≤ 256), a 32× scan-size reduction, and candidate
  * scoring drops from O(dim) to O(M) table lookups per pair.
  *
  * Asymmetric distance computation (ADC): corpus vectors are quantized,
  * queries are NOT — each query precomputes a (M × k) lookup table of
  * sub-space dot products against the codebook, and the approximate
  * cosine of (query, candidate) is the sum of M table entries selected
  * by the candidate's codes. Vectors are L2-normalized inside the
  * encoder/LUT so the approximated dot IS the cosine.
  *
  * All three expressions run map-side inside whole-stage codegen:
  * encoding rides the corpus scan (the 100 TB build is an
  * embarrassingly parallel map, same discipline as the MinHash/SimHash
  * signatures), the LUT rides the tiny query frame, and ADC is the
  * pair-scoring hot loop. The trained codebook travels as a reference
  * object in the generated code — never a shuffle, never a join.
  */
object ProductQuantizer {

  /** Sub-space argmin by L2 distance over the normalized vector; strict
    * `<` keeps the lowest centroid id on ties — deterministic on every
    * executor.
    */
  def encode(v: Array[Double], codebook: Array[Float], m: Int, k: Int): Array[Int] = {
    val subDim = codebook.length / (m * k)
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < k) {
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v(sub * subDim + d) - codebook((sub * k + j) * subDim + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      codes(sub) = best
      sub += 1
    }
    codes
  }

  def normalized(arr: ArrayData, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    val n = math.min(arr.numElements(), dim)
    var norm = 0.0
    var d = 0
    while (d < n) { val x = arr.getFloat(d).toDouble; v(d) = x; norm += x * x; d += 1 }
    if (norm > 0.0) {
      val inv = 1.0 / math.sqrt(norm)
      d = 0
      while (d < dim) { v(d) *= inv; d += 1 }
    }
    v
  }
}

/** pq_encode(vec): M sub-space centroid ids (array<int>) of an
  * L2-normalized float vector. The codebook is a train-time constant
  * (flat M×k×subDim row-major floats) carried as a codegen reference
  * object.
  */
case class PqEncode(child: Expression, codebook: Array[Float], m: Int, k: Int)
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && codebook.length % (m * k) == 0,
    "pq_encode: codebook length must be a multiple of m*k")
  private val subDim = codebook.length / (m * k)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = ProductQuantizer.normalized(input.asInstanceOf[ArrayData], m * subDim)
    UnsafeArrayData.fromPrimitiveArray(ProductQuantizer.encode(v, codebook, m, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      val norm = ctx.freshName("norm")
      val inv = ctx.freshName("inv")
      val codes = ctx.freshName("codes")
      val sub = ctx.freshName("sub")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val diff = ctx.freshName("diff")
      val dim = m * subDim
      s"""
         |double[] $v = new double[$dim];
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double $norm = 0.0;
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = (double) $arr.getFloat($d);
         |  $v[$d] = $x; $norm += $x * $x;
         |}
         |if ($norm > 0.0) {
         |  double $inv = 1.0 / java.lang.Math.sqrt($norm);
         |  for (int $d = 0; $d < $dim; $d++) $v[$d] *= $inv;
         |}
         |int[] $codes = new int[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0; double $bestDist = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dist = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = $v[$sub * $subDim + $d] - $cb[($sub * $k + $j) * $subDim + $d];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestDist) { $bestDist = $dist; $best = $j; }
         |  }
         |  $codes[$sub] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_lut(vec): the per-query ADC lookup table — array<double>[M×k]
  * where entry (sub*k + j) is the dot product of the normalized query's
  * sub-vector with codebook centroid (sub, j). Σ over a candidate's
  * codes approximates cosine(query, candidate).
  */
case class PqLut(child: Expression, codebook: Array[Float], m: Int, k: Int)
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && codebook.length % (m * k) == 0,
    "pq_lut: codebook length must be a multiple of m*k")
  private val subDim = codebook.length / (m * k)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = ProductQuantizer.normalized(input.asInstanceOf[ArrayData], m * subDim)
    val lut = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var j = 0
      while (j < k) {
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          dot += v(sub * subDim + d) * codebook((sub * k + j) * subDim + d)
          d += 1
        }
        lut(sub * k + j) = dot
        j += 1
      }
      sub += 1
    }
    UnsafeArrayData.fromPrimitiveArray(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      val norm = ctx.freshName("norm")
      val inv = ctx.freshName("inv")
      val lut = ctx.freshName("lut")
      val sub = ctx.freshName("sub")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val dim = m * subDim
      s"""
         |double[] $v = new double[$dim];
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double $norm = 0.0;
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = (double) $arr.getFloat($d);
         |  $v[$d] = $x; $norm += $x * $x;
         |}
         |if ($norm > 0.0) {
         |  double $inv = 1.0 / java.lang.Math.sqrt($norm);
         |  for (int $d = 0; $d < $dim; $d++) $v[$d] *= $inv;
         |}
         |double[] $lut = new double[$m * $k];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $dot += $v[$sub * $subDim + $d] * $cb[($sub * $k + $j) * $subDim + $d];
         |    }
         |    $lut[$sub * $k + $j] = $dot;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($lut);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(lut, codes): the ADC pair score — Σ_sub lut[sub*k +
  * codes[sub]], with k inferred as lut.length / codes.length. O(M)
  * per candidate pair regardless of vector dimension; the scoring hot
  * loop of a PQ scan.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lut.numElements() / m
    var score = 0.0
    var sub = 0
    while (sub < m) {
      score += lut.getDouble(sub * k + codes.getInt(sub))
      sub += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val sub = ctx.freshName("sub")
      s"""
         |int $m = $codes.numElements();
         |${ev.value} = 0.0;
         |if ($m > 0) {
         |  int $k = $lut.numElements() / $m;
         |  for (int $sub = 0; $sub < $m; $sub++) {
         |    ${ev.value} += $lut.getDouble($sub * $k + $codes.getInt($sub));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqEncode {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PqEncode].getName, "pq_encode")
}

object PqLut {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PqLut].getName, "pq_lut")
}

object PqAdc {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PqAdc].getName, "pq_adc")
}

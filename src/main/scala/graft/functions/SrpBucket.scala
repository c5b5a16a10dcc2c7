package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** srp_bucket(vec, nBits, table): signed-random-projection LSH bucket of a
  * float vector — bit j of the result is set iff the vector's dot product
  * with the j-th random hyperplane is positive. Hyperplanes use Rademacher
  * (±1) entries (Achlioptas-style sparse random projections: the sign of
  * <v, r> with ±1 entries estimates angle exactly like Gaussian SRP),
  * generated deterministically from splitmix64 of (table, bit, dim-word) —
  * no RNG state, every executor and every run derives the same planes, and
  * distinct `table` values give independent hash tables for OR-construction.
  *
  * One fused nBits×dim loop per row, map-side inside whole-stage codegen:
  * like the MinHash/SimHash signatures this keeps the 100 TB LSH build an
  * embarrassingly parallel scan — the only shuffle in an SRP-LSH query is
  * the (table, bucket) candidate join.
  *
  * Dot products accumulate sequentially in double; ties (dot == 0) hash to
  * bit 0 deterministically.
  */
case class SrpBucket(child: Expression, nBits: Int, table: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 30, "srp_bucket: nBits must be in [1, 30]")

  /** Supported vector width; masks are pregenerated to this many dims. */
  private val MaxDim = 1024
  private val Words  = MaxDim / 64

  /** Rademacher sign masks: bit d of row j lives at
    * masks(j * Words + d/64) bit (d mod 64); set bit = +1, clear = -1.
    * One splitmix64 word yields 64 independent sign entries.
    */
  private lazy val masks: Array[Long] =
    Array.tabulate(nBits * Words) { idx =>
      val j = idx / Words; val w = idx % Words
      SketchHash.fmix64(SketchHash.seed(((table * 1024) + j) * Words + w) ^ 0x5851F42D4C957F2DL)
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), MaxDim)
    var bucket = 0
    var j = 0
    while (j < nBits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = v.getFloat(d).toDouble
        dot += (if (((masks(j * Words + (d >> 6)) >>> (d & 63)) & 1L) == 1L) x else -x)
        d += 1
      }
      if (dot > 0.0) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val masksRef = ctx.addReferenceObj("srpMasks", masks, "long[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $MaxDim);
         |${ev.value} = 0;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $x = (double) $v.getFloat($d);
         |    $dot += ((($masksRef[$j * $Words + ($d >> 6)] >>> ($d & 63)) & 1L) == 1L)
         |      ? $x : -$x;
         |  }
         |  if ($dot > 0.0) ${ev.value} |= 1 << $j;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SrpBucket {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SrpBucket].getName, "srp_bucket")
}

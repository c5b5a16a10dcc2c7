package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd sketch signatures for the near-dup family.
  *
  * The round-2 formulation computed MinHash/SimHash signatures via
  * explode + 64-way aggregation: correct and codegen'd, but it pays a
  * full (doc_id)-shuffle of the exploded shingle table and carries 64
  * aggregation buffers per group — the measured cost center of
  * q41/q42. A signature is a pure per-document function of the shingle
  * array, so the right shape is a single fused loop per document:
  * map-side only, NO shuffle, no agg buffers, executed inside
  * whole-stage codegen. At 100 TB this turns signature computation
  * into an embarrassingly parallel scan-attached map — the shuffles
  * that remain in the dedup pipeline are the (band,bucket) candidate
  * join and the surviving pairs, both of which are output-sized rather
  * than corpus×64-sized.
  *
  * Hash family: slot k hashes shingle g as fmix64(g ^ splitmix64(k)) —
  * a full-avalanche 64-bit finalizer over a per-slot splitmix64 seed
  * stream (both mixers are public-domain constants from MurmurHash3 /
  * SplitMix64). Distributionally equivalent to the previous
  * xxhash64(k, g) slot family; the LSH recall envelope
  * ((1-j⁴)¹⁶ band-miss bound) depends only on slot-hash uniformity and
  * independence across slots, not on which mixer is used. The envelope
  * is re-validated empirically by the exact-Jaccard oracle (sf0.01)
  * and the q41==q40 output equality at sf0.1.
  */
object SketchHash {
  /** splitmix64(k): the per-slot seed stream. */
  def seed(k: Int): Long = {
    var z = k * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MurmurHash3 fmix64: full-avalanche finalizer. */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  /** Java source of fmix64 for the generated code, applied to `v`. */
  def fmix64Code(h: String, v: String): String =
    s"""long $h = $v;
       |$h ^= $h >>> 33; $h *= 0xFF51AFD7ED558CCDL;
       |$h ^= $h >>> 33; $h *= 0xC4CEB9FE1A85EC53L;
       |$h ^= $h >>> 33;""".stripMargin

  def requireLongArray(prettyName: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }
}

/** minhash_signature(sh): 64-slot MinHash signature of a shingle-hash
  * set, one fused loop (|sh| × 64 mixes), output array<long>[64].
  * Empty input ⇒ all slots Long.MaxValue (deterministic; an empty doc
  * collides only with other empty docs, which exact verify then drops).
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  import SketchHash._

  val numSlots = 64
  private lazy val seeds: Array[Long] = Array.tabulate(numSlots)(seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    requireLongArray(prettyName, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numSlots)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val g = arr.getLong(i)
      var k = 0
      while (k < numSlots) {
        val h = fmix64(g ^ seeds(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numSlots];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $g = $arr.getLong($i);
         |  for (int $k = 0; $k < $numSlots; $k++) {
         |    ${fmix64Code(h, s"$g ^ $seedsRef[$k]")}
         |    if ($h < $mins[$k]) $mins[$k] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, "minhash_signature")
}

/** simhash64(sh): 64-bit SimHash — per-bit majority vote over the
  * shingle hashes' own bits (identical semantics to the previous
  * 64-sum-aggregate formulation: bit k of the result is set iff
  * strictly more shingles have bit k set than clear). One fused loop,
  * map-side, no shuffle.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  import SketchHash._

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    requireLongArray(prettyName, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val g = arr.getLong(i)
      var k = 0
      while (k < 64) {
        votes(k) += (if (((g >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) sig |= 1L << k; k += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $g = $arr.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    $votes[$k] += ((($g >>> $k) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $sig |= 1L << $k;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "simhash64")
}

/** slot_agreement(a, b): number of positions where two equal-length
  * long signatures agree — the unbiased MinHash Jaccard estimator's
  * numerator, as one aligned primitive compare loop instead of an
  * interpreted zip_with/filter/size chain per candidate pair. Pair
  * volume is hot-bucket-driven at scale, so the estimator must be as
  * cheap as the banding join that feeds it.
  */
case class SlotAgreement(left: Expression, right: Expression) extends BinaryExpression {
  import SketchHash._

  override def dataType: DataType = IntegerType
  override def prettyName: String = "slot_agreement"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = requireLongArray(prettyName, left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else requireLongArray(prettyName, right)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SlotAgreement {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SlotAgreement].getName, "slot_agreement")
}

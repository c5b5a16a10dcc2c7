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

/** word_shingle_hashes(text[, n]): the sorted distinct xxhash64 (seed 42,
  * Spark's own XXH64) values of a document's word n-gram shingles, in ONE
  * pass over the UTF-8 bytes — no word-array materialization, no
  * per-shingle string allocation, no interpreted higher-order chain.
  *
  * Exactly the hash set of the declarative formulation it replaces
  * (`array_distinct(transform(TextOps.shingles(text), g -> xxhash64(g)))`):
  * `split(text, " ")` + `concat_ws(" ", slice(w, i, n))` reassembles the
  * original byte run between word starts (single-space separators are
  * preserved verbatim, consecutive spaces become empty words and are
  * re-joined to the same bytes), so each shingle IS a substring of the
  * input and is hashed in place via XXH64 over the same bytes Spark's
  * `xxhash64` would hash. Docs with fewer than n words yield one whole-doc
  * shingle (the `greatest(.., 1)` convention). Output order is sorted
  * (distinct-set semantics; every consumer is order-insensitive).
  *
  * This is the dedup family's scan-side cost center at 100 TB: shingling
  * is a pure map over `documents`, and this keeps it allocation-free
  * inside whole-stage codegen.
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    UnsafeArrayData.fromPrimitiveArray(WordShingleHashes.hashes(bytes, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $str.getBytes();
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(
         |    graft.functions.WordShingleHashes.hashes($bytes, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingleHashes].getName, "word_shingle_hashes")

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Sorted distinct XXH64 values of the word n-gram shingle substrings. */
  def hashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    // word starts: 0 and every byte after a 0x20 (the space byte cannot
    // occur inside a UTF-8 multibyte sequence)
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = len + 1 // sentinel: "start" one past a virtual trailing space
    val count = math.max(words - (n - 1), 1)
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      val start = starts(j)
      // substring ends one byte before the next word's start separator
      // (or at the end of the text for the tail / short-doc case)
      val end = if (j + n <= words) starts(j + n) - 1 else len
      out(j) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        end - start, Seed)
      j += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted hashes
    var uniq = 0
    var k = 0
    while (k < count) {
      if (k == 0 || out(k) != out(uniq - 1)) { out(uniq) = out(k); uniq += 1 }
      k += 1
    }
    if (uniq == count) out else java.util.Arrays.copyOf(out, uniq)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(key): membership probe of a pre-built
  * [[BloomFilter]] — the row-level runtime filter that makes a big-to-big
  * join affordable when the build side is too large to broadcast as a
  * hash relation but fits as a bloom (~1.2 bytes/key at 1% FPR, vs
  * tens of bytes/key for a hash table). The filter is distributively
  * aggregated once (`DataFrameStatFunctions.bloomFilter` — map-side
  * partial blooms merged by OR), then ships inside this expression to
  * every probe-side task, where it drops non-joining rows BEFORE the
  * shuffle that a plain shuffled join would pay for them.
  *
  * False positives pass the probe and are eliminated by the exact join
  * that follows; false negatives cannot occur — so any
  * `bloom-prefilter → exact join` composition is lossless and is graded
  * by the plain-join oracle (q160). This is the same contract as
  * Spark's own injected runtime bloom filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), made explicit
  * as an operator the user can place.
  *
  * Codegen: one virtual call on a referenced filter object per row —
  * stays inside whole-stage codegen (no CodegenFallback).
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomMightContain].getName, "bloom_might_contain")

  /** Serialize a built filter for transport as a binary literal; the
    * GraftExtensions builder unwraps it back into the expression at
    * resolution (the PQ-codebook literal pattern), so the DataFrame
    * call site is `call_function("bloom_might_contain", key,
    * lit(BloomMightContain.serialize(bf)))`.
    */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.readFrom(bytes)
}

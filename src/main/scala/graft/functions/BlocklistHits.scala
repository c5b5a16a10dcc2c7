package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** blocklist_hits(text, patterns): occurrence counts of EVERY pattern
  * in one pass over the text — Aho–Corasick 1975 (goto/failure/output
  * automaton over bytes), the multi-pattern scan a blocklist filter
  * (profanity/PII/license-header lexicons) needs at corpus scale.
  * Returns array<int> aligned with the pattern array; every match
  * position counts (overlapping included: "ana" hits "banana" twice),
  * matching a per-position substring-compare oracle exactly.
  *
  * The naive spelling is P regex/contains passes per document (or a
  * patterns×corpus join); this is ONE byte walk per document
  * regardless of |patterns|. The automaton is built from a pattern
  * ARRAY LITERAL at resolution (blocklists are config, not data),
  * ships as a codegen reference object, and rebuilds its transient
  * dense tables lazily per executor — no per-row work beyond the walk.
  */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "blocklist_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if patterns.nonEmpty && patterns.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: patterns must be non-empty strings")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  private lazy val automaton =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlocklistHits {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BlocklistHits].getName, "blocklist_hits")
}

/** Dense-table Aho–Corasick over bytes. States ≤ Σ|pattern| + 1 —
  * blocklists are small, so the 256-wide goto rows are the fast,
  * branch-free representation. Serializes by pattern bytes only; the
  * tables rebuild lazily on first use per JVM.
  */
final class AcAutomaton(val patterns: Array[Array[Byte]]) extends Serializable {

  /** (goto, outputs): goto(s)(byte) = next state (failure transitions
    * pre-resolved, so the walk never backtracks); outputs(s) = pattern
    * indices whose occurrence ends at state s (failure-closure merged).
    */
  @transient private lazy val tables: (Array[Array[Int]], Array[Array[Int]]) = {
    val maxStates = patterns.map(_.length).sum + 1
    val next = Array.fill(maxStates, 256)(-1)
    val out = Array.fill(maxStates)(List.empty[Int])
    var states = 1
    var pi = 0
    while (pi < patterns.length) {
      var cur = 0
      val p = patterns(pi)
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xff
        if (next(cur)(c) == -1) { next(cur)(c) = states; states += 1 }
        cur = next(cur)(c)
        i += 1
      }
      out(cur) ::= pi
      pi += 1
    }
    val fail = new Array[Int](states)
    val queue = mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      if (next(0)(c) == -1) next(0)(c) = 0
      else { fail(next(0)(c)) = 0; queue += next(0)(c) }
      c += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s))
      c = 0
      while (c < 256) {
        val t = next(s)(c)
        if (t == -1) next(s)(c) = next(fail(s))(c)
        else { fail(t) = next(fail(s))(c); queue += t }
        c += 1
      }
    }
    (next.take(states), out.take(states).map(_.toArray))
  }

  def run(text: UTF8String): ArrayData = {
    val (goto, outputs) = tables
    val bytes = text.getBytes
    val hits = new Array[Int](patterns.length)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = goto(s)(bytes(i) & 0xff)
      val os = outputs(s)
      var j = 0
      while (j < os.length) { hits(os(j)) += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hits)
  }
}

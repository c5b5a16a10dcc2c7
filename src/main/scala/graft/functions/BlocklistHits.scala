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

/** Aho–Corasick over bytes, with a size-adaptive representation.
  * States ≤ Σ|pattern| + 1. Up to [[AcAutomaton.DenseStateLimit]]
  * states the walk uses dense 256-wide goto rows with failure
  * transitions pre-resolved (branch-free, 1 KiB per state — ≈1 KiB
  * per pattern BYTE, so a config-sized blocklist costs megabytes but
  * a 100k-pattern URL corpus would silently cost a gigabyte per
  * executor). Above the limit it switches to a CSR sparse walk —
  * trie edges + failure links, O(Σ|pattern|) ints total — the
  * classic 1975 formulation, still amortized O(1) per text byte.
  * Serializes by pattern bytes only; tables rebuild lazily per JVM.
  */
final class AcAutomaton(
    val patterns: Array[Array[Byte]],
    denseStateLimit: Int = AcAutomaton.DenseStateLimit) extends Serializable {

  @transient private lazy val machine: AcAutomaton.Machine =
    AcAutomaton.build(patterns, denseStateLimit)

  private[functions] def isDense: Boolean =
    machine.isInstanceOf[AcAutomaton.Dense]

  def run(text: UTF8String): ArrayData = {
    val hits = new Array[Int](patterns.length)
    machine.walk(text.getBytes, hits)
    UnsafeArrayData.fromPrimitiveArray(hits)
  }
}

object AcAutomaton {

  /** Dense rows cost 1 KiB per state; 65,536 states caps them at
    * 64 MiB per executor — far above any config blocklist, far below
    * the silent-OOM regime a data-sized lexicon would reach.
    */
  val DenseStateLimit: Int = 65536

  private sealed trait Machine {
    def walk(bytes: Array[Byte], hits: Array[Int]): Unit
  }

  /** goto(s)(byte) = next state, failure pre-resolved (never
    * backtracks); outputs(s) = pattern indices ending at s
    * (failure-closure merged).
    */
  private final class Dense(goto: Array[Array[Int]], outputs: Array[Array[Int]])
      extends Machine {
    def walk(bytes: Array[Byte], hits: Array[Int]): Unit = {
      var s = 0
      var i = 0
      while (i < bytes.length) {
        s = goto(s)(bytes(i) & 0xff)
        val os = outputs(s)
        var j = 0
        while (j < os.length) { hits(os(j)) += 1; j += 1 }
        i += 1
      }
    }
  }

  /** CSR trie edges (per-state byte keys sorted, binary-searched) +
    * failure links walked at runtime — amortized O(1) per byte (the
    * fail chain only descends depth the goto chain previously built).
    */
  private final class Sparse(
      offsets: Array[Int], keys: Array[Int], targets: Array[Int],
      fail: Array[Int], outputs: Array[Array[Int]]) extends Machine {

    private def edge(s: Int, c: Int): Int = {
      var lo = offsets(s)
      var hi = offsets(s + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid)
        if (k == c) return targets(mid)
        else if (k < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    def walk(bytes: Array[Byte], hits: Array[Int]): Unit = {
      var s = 0
      var i = 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        var t = edge(s, c)
        while (t == -1 && s != 0) { s = fail(s); t = edge(s, c) }
        s = if (t == -1) 0 else t
        val os = outputs(s)
        var j = 0
        while (j < os.length) { hits(os(j)) += 1; j += 1 }
        i += 1
      }
    }
  }

  /** One sparse trie + failure/output construction (memory bounded by
    * Σ|pattern| regardless of representation), then the walk tables
    * materialize dense or stay sparse by state count.
    */
  private def build(patterns: Array[Array[Byte]], denseLimit: Int): Machine = {
    val edges = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val out = mutable.ArrayBuffer(List.empty[Int])
    var pi = 0
    while (pi < patterns.length) {
      var cur = 0
      val p = patterns(pi)
      var i = 0
      while (i < p.length) {
        val c = (p(i) & 0xff).toLong
        val nxt = edges(cur).getOrElse(c, -1)
        cur = if (nxt != -1) nxt else {
          edges += mutable.LongMap.empty[Int]
          out += Nil
          val s = edges.length - 1
          edges(cur)(c) = s
          s
        }
        i += 1
      }
      out(cur) ::= pi
      pi += 1
    }
    val states = edges.length
    val fail = new Array[Int](states)
    val queue = mutable.Queue.empty[Int]
    edges(0).foreach { case (_, t) => fail(t) = 0; queue += t }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s))
      edges(s).foreach { case (c, t) =>
        var f = fail(s)
        var g = edges(f).getOrElse(c, -1)
        while (g == -1 && f != 0) { f = fail(f); g = edges(f).getOrElse(c, -1) }
        fail(t) = if (g == -1 || g == t) 0 else g
        queue += t
      }
    }
    val outputs = out.map(_.toArray).toArray
    if (states <= denseLimit) {
      val next = Array.fill(states, 256)(0)
      val q2 = mutable.Queue.empty[Int]
      var c = 0
      while (c < 256) {
        val t = edges(0).getOrElse(c.toLong, 0)
        next(0)(c) = t
        if (t != 0) q2 += t
        c += 1
      }
      while (q2.nonEmpty) {
        val s = q2.dequeue()
        c = 0
        while (c < 256) {
          val t = edges(s).getOrElse(c.toLong, -1)
          if (t == -1) next(s)(c) = next(fail(s))(c)
          else { next(s)(c) = t; q2 += t }
          c += 1
        }
      }
      new Dense(next, outputs)
    } else {
      val offsets = new Array[Int](states + 1)
      var s = 0
      while (s < states) { offsets(s + 1) = offsets(s) + edges(s).size; s += 1 }
      val keys = new Array[Int](offsets(states))
      val targets = new Array[Int](offsets(states))
      s = 0
      while (s < states) {
        var k = offsets(s)
        edges(s).toSeq.sortBy(_._1).foreach { case (c, t) =>
          keys(k) = c.toInt; targets(k) = t; k += 1
        }
        s += 1
      }
      new Sparse(offsets, keys, targets, fail, outputs)
    }
  }
}

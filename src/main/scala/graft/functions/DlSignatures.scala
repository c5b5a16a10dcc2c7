package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** dl_signatures(name, withWindows): the blocking-signature array the
  * edit-distance lanes explode — positions 1..L of the single-wildcard
  * family (`"L:" + name` with position i replaced by the NUL sentinel), then,
  * when `withWindows`, positions 1..max(L−1,1) of the position-prefixed
  * SORTED-WINDOW family (`"L:p:" + name` with the adjacent pair at
  * (p, p+1) replaced by its two chars in sorted order — q277's
  * transposition detector). Array order matches the declarative
  * `concat(single, sortedWin)` exactly, so `posexplode` positions (and
  * the pos == 0 equal-name gate) are unchanged.
  *
  * Exists because the declarative spelling — two
  * `transform(sequence(...))` chains of concat/overlay/substr — runs
  * its lambdas INTERPRETED per element, and the signature frame sits on
  * BOTH branches of a self-join, so every record paid ~2·(2L−1)
  * interpreted lambda trees per lane evaluation (the q41/q279 lesson in
  * the entity-resolution family). One fused loop per row; string
  * semantics are reproduced degenerate-edge-for-degenerate-edge for
  * non-empty BMP strings (1-char names: the window overlay degenerates
  * to the unchanged string — spec-pinned; empty names never reach this
  * expression — the declarative form itself degenerates on
  * `sequence(1, 0)` there).
  */
case class DlSignatures(child: Expression, withWindows: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "dl_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DlSignatures.sigs(input.asInstanceOf[UTF8String], withWindows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DlSignatures.sigs($c, $withWindows)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DlSignatures {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DlSignatures].getName, "dl_signatures")

  def sigs(s: UTF8String, withWindows: Boolean): GenericArrayData = {
    val str = s.toString
    // the declarative length/overlay/substr this kernel replaced count
    // CODE POINTS; the fast path below indexes UTF-16 units, which is
    // identical for BMP-only strings — anything carrying a surrogate
    // pair takes the code-point-correct slow path
    if (str.length != str.codePointCount(0, str.length))
      return sigsCodePoints(str, withWindows)
    val l = str.length
    val out = new Array[Any](if (withWindows) l + math.max(l - 1, 1) else l)
    val lp = java.lang.Integer.toString(l)
    val sb = new java.lang.StringBuilder(lp.length + 12 + l)
    var idx = 0
    var i = 1
    while (i <= l) {
      sb.setLength(0)
      sb.append(lp).append(':')
        .append(str, 0, i - 1).append('\u0000').append(str, i, l)
      out(idx) = UTF8String.fromString(sb.toString); idx += 1; i += 1
    }
    if (withWindows) {
      val pMax = math.max(l - 1, 1)
      var p = 1
      while (p <= pMax) {
        sb.setLength(0)
        sb.append(lp).append(':').append(p).append(':')
        if (p + 1 <= l) {
          val x = str.charAt(p - 1)
          val y = str.charAt(p)
          val lo = if (x <= y) x else y
          val hi = if (x <= y) y else x
          sb.append(str, 0, p - 1).append(lo).append(hi).append(str, p + 1, l)
        } else {
          // l == 1: substr(p+1, 1) is empty, least/greatest collapse to
          // ("", c), and the 1-char overlay leaves the string unchanged
          sb.append(str)
        }
        out(idx) = UTF8String.fromString(sb.toString); idx += 1; p += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Code-point-indexed twin of the fast path, for names containing
    * non-BMP characters. Window-pair sorting compares code points —
    * equal to the replaced `least/greatest` single-char string compare,
    * since UTF-8 byte order preserves code point order.
    */
  private def sigsCodePoints(str: String, withWindows: Boolean): GenericArrayData = {
    val cps = str.codePoints().toArray
    val l = cps.length
    val out = new Array[Any](if (withWindows) l + math.max(l - 1, 1) else l)
    val lp = java.lang.Integer.toString(l)
    val sb = new java.lang.StringBuilder(lp.length + 12 + str.length)
    def cpsRange(from: Int, until: Int): Unit = {
      var j = from
      while (j < until) { sb.appendCodePoint(cps(j)); j += 1 }
    }
    var idx = 0
    var i = 1
    while (i <= l) {
      sb.setLength(0)
      sb.append(lp).append(':')
      cpsRange(0, i - 1); sb.append('\u0000'); cpsRange(i, l)
      out(idx) = UTF8String.fromString(sb.toString); idx += 1; i += 1
    }
    if (withWindows) {
      val pMax = math.max(l - 1, 1)
      var p = 1
      while (p <= pMax) {
        sb.setLength(0)
        sb.append(lp).append(':').append(p).append(':')
        if (p + 1 <= l) {
          val x = cps(p - 1)
          val y = cps(p)
          cpsRange(0, p - 1)
          sb.appendCodePoint(math.min(x, y)).appendCodePoint(math.max(x, y))
          cpsRange(p + 1, l)
        } else {
          sb.append(str)
        }
        out(idx) = UTF8String.fromString(sb.toString); idx += 1; p += 1
      }
    }
    new GenericArrayData(out)
  }
}

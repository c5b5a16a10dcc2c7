package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** char_ngrams(text, nMax): every character n-gram of `text` for
  * n = 1..nMax, each PREFIXED with its one-char order tag ('1'..'9') so
  * a single array carries all orders unambiguously (the tag decodes as
  * substring(g, 1, 1); two grams compare equal iff same order AND same
  * characters). Short-string convention matches the SQL-side
  * `range(1, greatest(len-n+2, 2))` + slice form the chrF oracle uses:
  * a string shorter than n emits itself once for that order.
  *
  * Exists because the declarative spelling — nested
  * `transform(sequence(...), i => substr(...))` lambdas — evaluates
  * INTERPRETED per row (the q41 lesson): ~3·len lambda invocations
  * per document put the gram build at ~90% of q279's runtime at the
  * derived decade. This is one fused per-row loop, codegen-callable,
  * allocation-exact.
  */
case class CharNgrams(child: Expression, nMax: Int, nMin: Int = 1)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if nMin >= 1 && nMin <= nMax && nMax <= 9 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: need 1 <= nMin <= nMax <= 9 (one-char tags), got ($nMin, $nMax)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.grams(input.asInstanceOf[UTF8String], nMax, nMin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgrams.grams($c, $nMax, $nMin)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CharNgrams].getName, "char_ngrams")

  def grams(s: UTF8String, nMax: Int): GenericArrayData = grams(s, nMax, 1)

  def grams(s: UTF8String, nMax: Int, nMin: Int): GenericArrayData = {
    val str = s.toString
    val len = str.length
    var total = 0
    var n = nMin
    while (n <= nMax) {
      total += (if (len < n) 1 else len - n + 1)
      n += 1
    }
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder(nMax + 1)
    var idx = 0
    n = nMin
    while (n <= nMax) {
      val tag = ('0' + n).toChar
      if (len < n) {
        sb.setLength(0); sb.append(tag).append(str)
        out(idx) = UTF8String.fromString(sb.toString); idx += 1
      } else {
        var i = 0
        while (i + n <= len) {
          sb.setLength(0); sb.append(tag).append(str, i, i + n)
          out(idx) = UTF8String.fromString(sb.toString)
          idx += 1; i += 1
        }
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}

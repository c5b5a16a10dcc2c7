package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** word_ngrams(text, n): every space-delimited word n-gram of `text`,
  * in position order, each gram joined by single spaces — EXACTLY the
  * array the declarative spelling builds with
  * `zip_with(slice(split(text,' '),1,L-n+1), …, concat)` (and the
  * DuckDB twin with `list_transform(range(…), i -> ws[i]||' '||…)`),
  * including the empty-token behavior of regex split with limit -1:
  * a doc with fewer than n words emits an EMPTY array.
  *
  * Exists because the nested `zip_with` gram builders evaluate
  * INTERPRETED per row (the q41/q279 lesson — they were ~90% of a
  * scoring lane's runtime at the derived decade): this is one fused
  * per-row byte scan, codegen-callable. The key observation making it
  * allocation-exact: joining consecutive words with ' ' reproduces a
  * SUBSTRING of the original text (words are the segments between
  * space bytes), so each gram is one UTF8String.fromBytes over the
  * shared byte array — no tokenization, no StringBuilder, no per-word
  * garbage. Space is ASCII 0x20 and UTF-8 multibyte sequences never
  * contain it, so the byte scan is correct on any input.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: need n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_windows(text, w): NON-OVERLAPPING w-word windows of `text` —
  * the segmentation shape (CCNet paragraphs q286, span dedup q81) —
  * including the truncated tail window, so the count is exactly
  * ⌈words/w⌉, matching the declarative
  * `transform(sequence(1, ceil(size(ws)/w)), i -> array_join(slice(ws,
  * (i-1)*w+1, w), ' '))` spelling (and its concat_ws twin: slice
  * beyond the array truncates). Same substring-backed zero-copy
  * emission as [[WordNgrams]].
  */
case class WordWindows(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: need w >= 1, got $w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.windows(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.windows($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordWindows {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordWindows].getName, "word_windows")
}

/** word_ngrams_upto(text, nMax): every word n-gram for EVERY order
  * n = 1..nMax in one array, each gram PREFIXED with its one-char
  * order tag '1'..'9' (the [[CharNgrams]] convention: the tag decodes
  * as substring(g, 1, 1); two tagged grams compare equal iff same
  * order AND same words). Emission order is order-major, positions
  * ascending. Per-order semantics match [[WordNgrams]] exactly: a doc
  * with fewer than n words emits nothing for that order.
  *
  * Exists for the multi-order consumers (novel-n-gram-rate q298):
  * one fused byte scan replaces nMax separate corpus scans — the
  * all-orders form of the q279 lesson. The tag byte forces one
  * exact-sized allocation per gram (a tagged gram is no longer a pure
  * substring), still zero per-word garbage.
  */
case class WordNgramsUpto(child: Expression, nMax: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams_upto"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if nMax >= 1 && nMax <= 9 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: need 1 <= nMax <= 9 (one-char tags), got $nMax")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.gramsUpto(input.asInstanceOf[UTF8String], nMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.gramsUpto($c, $nMax)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramsUpto {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordNgramsUpto].getName, "word_ngrams_upto")
}

object WordNgrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordNgrams].getName, "word_ngrams")

  /** All word n-grams as substrings of the input's byte array. Word
    * boundaries are every 0x20 byte (regex-split-on-" " semantics:
    * consecutive spaces delimit empty words, trailing empties kept).
    */
  def grams(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // starts(i) = byte offset of word i; one more sentinel start at len+1
    // conceptually (each word w spans [starts(w), starts(w+1) - 2])
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) words += 1; i += 1 }
    if (words < n) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](words + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = len + 1
    val out = new Array[Any](words - n + 1)
    var g = 0
    while (g <= words - n) {
      val from = starts(g)
      val until = starts(g + n) - 1 // drop the delimiter after the last word
      out(g) = UTF8String.fromBytes(bytes, from, until - from)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** All orders 1..nMax, tagged — see [[graft.functions.WordNgramsUpto]]. */
  def gramsUpto(s: UTF8String, nMax: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = len + 1
    val top = math.min(nMax, words)
    var total = 0
    var n = 1
    while (n <= top) { total += words - n + 1; n += 1 }
    val out = new Array[Any](total)
    var idx = 0
    n = 1
    while (n <= top) {
      var g = 0
      while (g <= words - n) {
        val from = starts(g)
        val until = starts(g + n) - 1
        val glen = until - from
        val tagged = new Array[Byte](glen + 1)
        tagged(0) = ('0' + n).toByte
        System.arraycopy(bytes, from, tagged, 1, glen)
        out(idx) = UTF8String.fromBytes(tagged)
        idx += 1
        g += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping w-word windows with truncated tail — see
    * [[graft.functions.WordWindows]].
    */
  def windows(s: UTF8String, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var words = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(words) = len + 1
    val nWin = (words + w - 1) / w
    val out = new Array[Any](nWin)
    var g = 0
    while (g < nWin) {
      val from = starts(g * w)
      val endWord = math.min(g * w + w, words)
      val until = starts(endWord) - 1
      out(g) = UTF8String.fromBytes(bytes, from, until - from)
      g += 1
    }
    new GenericArrayData(out)
  }
}

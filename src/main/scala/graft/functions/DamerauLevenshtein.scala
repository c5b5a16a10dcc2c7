package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** damerau_levenshtein(s1, s2): the UNRESTRICTED Damerau–Levenshtein
  * edit distance (Lowrance & Wagner 1975) — insert, delete, substitute,
  * and transpose-adjacent, where later edits may touch transposed
  * characters (so `ca → abc` costs 2: transpose then insert, which the
  * restricted OSA variant cannot reach and scores 3). This is the
  * variant DuckDB ships as `damerau_levenshtein`, making the oracle an
  * exact integer compare. Operates on bytes (≡ DuckDB's VARCHAR
  * semantics for the ASCII keys these lanes run on).
  *
  * Spark ships `levenshtein` only; record-linkage verification wants
  * the transposition discount — adjacent-character swaps are the
  * dominant human typo class (Damerau 1964 measured ~80% of misspelled
  * words within one insert/delete/substitute/transpose) and plain
  * Levenshtein double-charges them. Native codegen'd expression: one
  * O(|s1|·|s2|) DP per pair with a 256-slot last-seen table, no UDF,
  * stays inside whole-stage codegen (the generated code calls the
  * static DP the same way Spark's own `levenshtein` calls
  * `UTF8String.levenshteinDistance`).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.distance($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DamerauLevenshtein].getName, "damerau_levenshtein")

  /** Lowrance–Wagner DP over byte strings. `h` is the classic
    * (n+2)×(m+2) matrix with an `inf` border row/column so the
    * transposition lookup `h(i1-1)(j1-1)` is always in range; `da`
    * tracks, per byte value, the last (1-based) row where it occurred
    * in s1. Flattened to one array for allocation + cache behavior.
    */
  def distance(s1: Array[Byte], s2: Array[Byte]): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val w = m + 2
    val h = new Array[Int]((n + 2) * w)
    h(0) = inf
    var i = 0
    while (i <= n) { h((i + 1) * w) = inf; h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { h(j + 1) = inf; h(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      val c1 = s1(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val c2 = s2(j - 1) & 0xff
        val i1 = da(c2)
        val j1 = db
        var cost = 1
        if (c1 == c2) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val trans = h(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        h((i + 1) * w + j + 1) = best
        j += 1
      }
      da(c1) = i
      i += 1
    }
    h((n + 1) * w + m + 1)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** min_shingle_md5(text[, n]): the winnowing-style min-shingle fingerprint
  * — struct(min_shingle_fp: the lexicographic minimum of md5(g) over the
  * document's distinct word n-gram shingles g, n_shingles: their count) —
  * in ONE pass per row.
  *
  * This replaces q31's explode + md5 + groupBy-min formulation: the
  * fingerprint is a pure per-document function, so the right shape (the
  * same argument as minhash_signature/simhash64) is a fused map-side loop
  * — no shingle-array materialization, no explode, no aggregation, no
  * shuffle. At 100 TB document fingerprinting becomes an embarrassingly
  * parallel scan.
  *
  * Exact-oracle equivalences the fused loop preserves:
  * - shingle substrings are reassembled from the UTF-8 byte runs between
  *   word starts exactly like word_shingle_hashes (single-space separators
  *   verbatim; < n words ⇒ one whole-doc shingle);
  * - min over md5 HEX strings == unsigned byte order of the raw digests
  *   (hex chars are value-ordered in ASCII), so the loop tracks the min
  *   digest and hex-encodes once at the end;
  * - duplicates cannot change a min, so md5 runs only on first sight of a
  *   shingle; the distinct count dedups by the same 64-bit shingle hash
  *   as the dedup family (q40's oracle equality already pins hash-set ==
  *   string-set on this corpus).
  */
case class MinShingleMd5(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("min_shingle_fp", StringType, nullable = false),
    StructField("n_shingles", LongType, nullable = false)))
  override def prettyName: String = "min_shingle_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinShingleMd5.fingerprint(input.asInstanceOf[UTF8String].getBytes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.MinShingleMd5
         |  .fingerprint($str.getBytes(), $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinShingleMd5 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinShingleMd5].getName, "min_shingle_md5")

  private val Seed = 42L // the word_shingle_hashes dedup-hash seed

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One fused pass: word starts → per-shingle 64-bit dedup hash → md5 of
    * first-seen shingles → unsigned-min digest → hex. Returns the
    * (min_shingle_fp, n_shingles) struct row.
    */
  def fingerprint(bytes: Array[Byte], n: Int): InternalRow = {
    val len = bytes.length
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
    starts(words) = len + 1
    val count = math.max(words - (n - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val digest = md5.get()
    var minDigest: Array[Byte] = null
    var j = 0
    while (j < count) {
      val start = starts(j)
      val end = if (j + n <= words) starts(j + n) - 1 else len
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
        end - start, Seed)
      if (seen.add(h)) {
        digest.reset()
        digest.update(bytes, start, end - start)
        val d = digest.digest()
        if (minDigest == null || unsignedLess(d, minDigest)) minDigest = d
      }
      j += 1
    }
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HexDigits((minDigest(k) >> 4) & 0xF)
      hex(2 * k + 1) = HexDigits(minDigest(k) & 0xF)
      k += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(new String(hex)), seen.size.toLong))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xFF; val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

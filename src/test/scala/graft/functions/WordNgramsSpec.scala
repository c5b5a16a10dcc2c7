package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** word_ngrams must be BIT-IDENTICAL to the declarative zip_with
  * spelling it replaces (the KN lanes' oracle twins state that form in
  * DuckDB), including the regex-split-on-" " empty-token semantics.
  */
class WordNgramsSpec extends SparkSpec {

  private def declarative(n: Int) = {
    val ws = split(col("text"), " ")
    val len = greatest(size(ws) - (n - 1), lit(0))
    (1 to n).map(i => slice(ws, lit(i), len))
      .reduceLeft((acc, next) => zip_with(acc, next,
        (a, b) => concat(a, lit(" "), b)))
  }

  test("equals the zip_with spelling on the real corpus for n = 2, 3, 4") {
    graft.GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(2, 3, 4)) {
      val diff = docs.select(
          call_function("word_ngrams", col("text"), lit(n)).as("got"),
          declarative(n).as("want"))
        .filter(col("got") =!= col("want"))
      assert(diff.isEmpty, s"n=$n: ${diff.take(1).mkString}")
    }
  }

  private def declarativeWindows(w: Int) = {
    val ws = split(col("text"), " ")
    transform(sequence(lit(1), ceil(size(ws) / lit(w.toDouble)).cast("int")),
      i => array_join(slice(ws, (i - 1) * w + 1, lit(w)), " "))
  }

  test("word_windows equals the transform/slice/array_join spelling on the real corpus") {
    graft.GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (w <- Seq(2, 16, 50)) {
      val diff = docs.select(
          call_function("word_windows", col("text"), lit(w)).as("got"),
          declarativeWindows(w).as("want"))
        .filter(col("got") =!= col("want"))
      assert(diff.isEmpty, s"w=$w: ${diff.take(1).mkString}")
    }
    // hand-pinned: truncated tail, exact fit, single short doc
    val win = (t: String, w: Int) =>
      WordNgrams.windows(org.apache.spark.unsafe.types.UTF8String.fromString(t), w)
        .array.map(_.toString).toSeq
    assert(win("a b c d e", 2) == Seq("a b", "c d", "e"))
    assert(win("a b c d", 2) == Seq("a b", "c d"))
    assert(win("a", 16) == Seq("a"))
  }

  test("property: word_ngrams/word_windows match a Scala reference model on " +
    "random texts (incl. empty words and multibyte)") {
    import org.scalacheck.Gen
    val word = Gen.frequency(
      (8, Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))),
      (1, Gen.const("")),                 // consecutive/edge spaces
      (1, Gen.oneOf("héllo", "über", "naïve", "日本語")))
    val text = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = graft.GenUtil.sampled(Gen.listOfN(200, text))
    def u(t: String) = org.apache.spark.unsafe.types.UTF8String.fromString(t)
    for (t <- texts; n <- Seq(1, 2, 3, 4, 7)) {
      val w = t.split(" ", -1) // regex split, limit -1: keep trailing empties
      val wantN = if (w.length < n) Seq.empty
        else w.sliding(n).map(_.mkString(" ")).toSeq
      val gotN = WordNgrams.grams(u(t), n).array.map(_.toString).toSeq
      assert(gotN == wantN, s"ngrams n=$n text='$t'")
      val wantW = w.grouped(n).map(_.mkString(" ")).toSeq
      val gotW = WordNgrams.windows(u(t), n).array.map(_.toString).toSeq
      assert(gotW == wantW, s"windows w=$n text='$t'")
    }
    // tagged all-orders scan == per-order scans with tag prefixes,
    // order-major (the q298 consumer decodes the tag as substring(1,1))
    for (t <- texts; nMax <- Seq(1, 3, 8)) {
      val w = t.split(" ", -1)
      val want = (1 to nMax).flatMap { n =>
        if (w.length < n) Seq.empty
        else w.sliding(n).map(g => s"$n" + g.mkString(" ")).toSeq
      }
      val got = WordNgrams.gramsUpto(u(t), nMax).array.map(_.toString).toSeq
      assert(got == want, s"gramsUpto nMax=$nMax text='$t'")
    }
  }

  test("edge cases: short docs, empty string, consecutive/trailing spaces, multibyte") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val cases = Seq(
      "a b c",            // shorter than 4 words -> empty at n=4
      "",                  // split("", " ") = [""] -> one 1-gram, none at n>=2
      "a  b",              // consecutive spaces: empty middle token kept
      "a b ",              // trailing space: trailing empty token kept
      "héllo wörld über tokens naïve") // multibyte never contains 0x20
    val df = cases.toDF("text")
    for (n <- Seq(1, 2, 3, 4)) {
      val rows = df.select(col("text"),
          call_function("word_ngrams", col("text"), lit(n)).as("got"),
          declarative(n).as("want"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n text='${r.getString(0)}': ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
    // and the hand-stated facts the corpus law can't pin:
    val g = (t: String, n: Int) =>
      WordNgrams.grams(org.apache.spark.unsafe.types.UTF8String.fromString(t), n)
        .array.map(_.toString).toSeq
    assert(g("a b c", 4) == Seq.empty)
    assert(g("", 1) == Seq(""))
    assert(g("a  b", 2) == Seq("a ", " b"))
    assert(g("a b ", 2) == Seq("a b", "b "))
    assert(g("héllo wörld über", 2) == Seq("héllo wörld", "wörld über"))
  }
}

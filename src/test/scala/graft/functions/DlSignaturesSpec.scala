package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dl_signatures must be STRING-FOR-STRING identical to the declarative
  * transform(sequence(...)) concat/overlay spelling it replaces in the
  * q108/q218 (single-wildcard) and q277 (both-family) blocking lanes —
  * same strings, same array order (posexplode positions and the
  * pos == 0 equal-name gate depend on it), including the 1-char-name
  * degenerate window.
  */
class DlSignaturesSpec extends SparkSpec {

  private def declSingle(name: Column): Column =
    transform(sequence(lit(1), length(name)),
      i => concat(length(name).cast("string"), lit(":"),
        overlay(name, lit("\u0000"), i)))

  private def declBoth(name: Column): Column = {
    val sortedWin = transform(sequence(lit(1), greatest(length(name) - 1, lit(1))),
      p => {
        val x = name.substr(p, lit(1))
        val y = name.substr(p + 1, lit(1))
        concat(length(name).cast("string"), lit(":"), p.cast("string"),
          lit(":"), overlay(name, concat(least(x, y), greatest(x, y)), p))
      })
    concat(declSingle(name), sortedWin)
  }

  test("equals the declarative spellings on the real customer corpus") {
    graft.GraftExtensions.register(spark)
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_name").as("n"))
    val d1 = c.select(
        call_function("dl_signatures", col("n"), lit(false)).as("got"),
        declSingle(col("n")).as("want"))
      .filter(col("got") =!= col("want"))
    assert(d1.isEmpty, d1.take(1).mkString)
    val d2 = c.select(
        call_function("dl_signatures", col("n"), lit(true)).as("got"),
        declBoth(col("n")).as("want"))
      .filter(col("got") =!= col("want"))
    assert(d2.isEmpty, d2.take(1).mkString)
  }

  test("equals the declarative spellings on synthetic edges " +
    "(1-char names, repeats, swapped pairs, digits)") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val names = Seq("a", "ab", "ba", "aab", "aba", "baab", "abba",
      "Customer#000000012", "Customer#000000021", "zz", "z")
    val c = names.toDF("n")
    val d = c.select(
        call_function("dl_signatures", $"n", lit(true)).as("got"),
        declBoth($"n").as("want"))
      .filter($"got" =!= $"want")
    assert(d.isEmpty, d.take(1).mkString)
  }

  test("equals the declarative spellings on non-BMP names " +
    "(code-point slow path: surrogate pairs must index like substr/overlay)") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // emoji + Deseret + Gothic: every char here is a surrogate PAIR in
    // UTF-16, so any UTF-16-unit indexing diverges from the declarative
    // code-point spelling in both families
    val names = Seq("😀", "a😀b", "𐐷𐐯",
      "x𐌰", "😀😀a", "ab𐐷")
    val c = names.toDF("n")
    val d = c.select(
        call_function("dl_signatures", $"n", lit(true)).as("got"),
        declBoth($"n").as("want"))
      .filter($"got" =!= $"want")
    assert(d.isEmpty, d.take(1).mkString)
    val d1 = c.select(
        call_function("dl_signatures", $"n", lit(false)).as("got"),
        declSingle($"n").as("want"))
      .filter($"got" =!= $"want")
    assert(d1.isEmpty, d1.take(1).mkString)
  }
}

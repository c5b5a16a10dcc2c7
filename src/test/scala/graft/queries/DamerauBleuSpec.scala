package graft.queries

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.DamerauLevenshtein

/** q277 Damerau–Levenshtein typo pairs + q278 BLEU-2 contamination:
  * the native distance against DuckDB-anchored values and an
  * independent BFS edit-search, the double-wildcard blocking against
  * brute force on real data, and the BLEU score against a hand
  * computation.
  */
class DamerauBleuSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("damerau_levenshtein: DuckDB-anchored values (unrestricted variant)") {
    // every expected value checked against duckdb 1.0.0 damerau_levenshtein
    assert(dl("ca", "abc") == 2)      // transpose then insert — OSA says 3
    assert(dl("abc", "ca") == 2)      // symmetric
    assert(dl("ab", "ba") == 1)       // pure adjacent transposition
    assert(dl("ab", "bca") == 2)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("abcdef", "") == 6)
    assert(dl("", "x") == 1)
    assert(dl("", "") == 0)
    assert(dl("same", "same") == 0)
    assert(dl("abcd", "abdc") == 1)   // mid-string transposition
  }

  test("damerau_levenshtein agrees with an independent BFS edit search") {
    // BFS over the true edit graph (insert / delete / substitute /
    // transpose-adjacent, all over the CURRENT string — exactly the
    // unrestricted model) to depth 3: an implementation-independent
    // ground truth for short strings.
    val alphabet = "abc"
    def neighbors(s: String): Iterator[String] = {
      val subs = for (i <- (0 until s.length).iterator; c <- alphabet.iterator
                      if s(i) != c) yield s.updated(i, c)
      val ins = for (i <- (0 to s.length).iterator; c <- alphabet.iterator)
        yield s.substring(0, i) + c + s.substring(i)
      val del = for (i <- (0 until s.length).iterator)
        yield s.substring(0, i) + s.substring(i + 1)
      val tr = for (i <- (0 until s.length - 1).iterator if s(i) != s(i + 1))
        yield s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
      subs ++ ins ++ del ++ tr
    }
    def bfs(a: String, b: String, maxD: Int): Option[Int] = {
      if (a == b) return Some(0)
      var frontier = Set(a)
      val seen = mutable.Set(a)
      var d = 0
      while (d < maxD) {
        d += 1
        val next = frontier.iterator.flatMap(neighbors)
          .filterNot(seen).toSet
        if (next.contains(b)) return Some(d)
        seen ++= next
        frontier = next
      }
      None
    }
    val rng = new Random(277)
    for (_ <- 1 to 60) {
      val a = Seq.fill(rng.nextInt(5))(alphabet(rng.nextInt(3))).mkString
      val b = Seq.fill(rng.nextInt(5))(alphabet(rng.nextInt(3))).mkString
      bfs(a, b, 3) match {
        case Some(d) => assert(dl(a, b) == d, s"dl($a, $b)")
        case None    => assert(dl(a, b) > 3, s"dl($a, $b) should exceed 3")
      }
    }
  }

  test("damerau_levenshtein is a metric: symmetric, dl <= lev, triangle inequality") {
    val rng = new Random(278)
    val alphabet = "abcd"
    def rs() = Seq.fill(rng.nextInt(7))(alphabet(rng.nextInt(4))).mkString
    for (_ <- 1 to 80) {
      val (a, b, c) = (rs(), rs(), rs())
      assert(dl(a, b) == dl(b, a), s"symmetry ($a, $b)")
      val lev = {  // reference Levenshtein for the upper bound
        val m = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      assert(dl(a, b) <= lev, s"dl must never exceed levenshtein ($a, $b)")
      assert(dl(a, c) <= dl(a, b) + dl(b, c), s"triangle ($a, $b, $c)")
      assert((dl(a, b) == 0) == (a == b), s"identity ($a, $b)")
    }
  }

  test("q277: blocked pairs == brute-force DL<=1 pairs on the real sf0.001 customer table") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val blocked = Entity.q277DamerauTypos(spark, dir)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val c = graft.sources.Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name")
    val brute = c.as("a").crossJoin(c.as("b"))
      .filter($"a.c_custkey" < $"b.c_custkey" &&
        length($"a.c_name") === length($"b.c_name") &&
        call_function("damerau_levenshtein", $"a.c_name", $"b.c_name") <= 1)
      .select($"a.c_custkey", $"b.c_custkey").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(blocked == brute)
  }

  test("q277 finds the adjacent-transposition pair q108's metric double-charges") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dl").toString
    Seq(
      (1L, "id-012"), (2L, "id-021"),  // adjacent digit swap: dl 1, lev 2
      (3L, "id-120"),                  // dl 2 from both — excluded
      (4L, "xy-999")
    ).toDF("c_custkey", "c_name").write.mode("overwrite")
      .parquet(s"$tmp/customer.parquet")
    val rows = Entity.q277DamerauTypos(spark, tmp).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1),
      r.getInt(r.fieldIndex("dl")), r.getInt(r.fieldIndex("lev")))).toSeq
    assert(got == Seq((1L, 2L, 1, 2)))
  }

  test("q278: BLEU-2 matches the hand computation on a two-doc corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bleu").toString
    Seq(
      (0L, "the cat sat on the mat"),  // eval (doc_id % 50 == 0), r = 6
      (1L, "the cat sat here")         // train, shares "the cat sat"; c = 4
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val rows = TextOps.q278BleuContamination(spark, tmp).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 0L))
    val p1 = 3.0 / 4          // the, cat, sat clip to 1 each; "here" unshared
    val p2 = 2.0 / 3          // "the cat", "cat sat" of 3 train bigrams
    val bleu = math.exp(1.0 - 6.0 / 4) * math.sqrt(p1 * p2)
    assert(math.abs(r.getFloat(r.fieldIndex("p1")) - p1) < 1e-6)
    assert(math.abs(r.getFloat(r.fieldIndex("p2")) - p2) < 1e-6)
    assert(math.abs(r.getFloat(r.fieldIndex("bleu2")) - bleu) < 1e-6)
  }

  test("q278: verbatim inclusion scores bleu2 = 1") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bleu2").toString
    Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta")   // identical train copy
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val r = TextOps.q278BleuContamination(spark, tmp).collect().head
    assert(r.getFloat(r.fieldIndex("bleu2")) == 1.0f)
  }

  /** Independent chrF ground truth: sliding-window char n-grams over
    * space-stripped strings, clipped multiset intersection, F_2 per
    * order, macro mean — straight from the paper's definition.
    */
  private def chrfRef(train: String, eval: String): (Double, Double, Double, Double) = {
    def grams(s: String, n: Int): Map[String, Int] = {
      val cs = s.replace(" ", "")
      val slid = if (cs.length < n) Seq(cs) else cs.sliding(n).toSeq
      slid.groupBy(identity).map { case (g, o) => (g, o.size) }
    }
    def f(n: Int): Double = {
      val t = grams(train, n); val e = grams(eval, n)
      val m = t.map { case (g, c) => math.min(c, e.getOrElse(g, 0)) }.sum.toDouble
      val ct = train.replace(" ", "").length
      val re = eval.replace(" ", "").length
      val p = m / math.max(ct - (n - 1), 1)
      val r = m / math.max(re - (n - 1), 1)
      5.0 * p * r / (4.0 * p + r)
    }
    (f(1), f(2), f(3), (f(1) + f(2) + f(3)) / 3.0)
  }

  test("q279: chrF matches an independent sliding-window computation") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-chrf").toString
    val evalTxt = "the cat sat on the mat"
    val trainTxt = "the cat sat here"     // shares "the cat sat"
    Seq((0L, evalTxt), (1L, trainTxt)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextOps.q279ChrfContamination(spark, tmp).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 0L))
    val (f1, f2, f3, c) = chrfRef(trainTxt, evalTxt)
    assert(math.abs(r.getFloat(r.fieldIndex("f1")) - f1) < 1e-6)
    assert(math.abs(r.getFloat(r.fieldIndex("f2")) - f2) < 1e-6)
    assert(math.abs(r.getFloat(r.fieldIndex("f3")) - f3) < 1e-6)
    assert(math.abs(r.getFloat(r.fieldIndex("chrf")) - c) < 1e-6)
  }

  test("q279: chrF is tokenization-robust where BLEU is not") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-chrf2").toString
    // same characters, different spacing: word n-grams diverge hard,
    // char n-grams barely move — the reason chrF rides next to BLEU
    Seq(
      (0L, "data base systems are great here"),
      (1L, "database systems are great here")
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val chrf = TextOps.q279ChrfContamination(spark, tmp).collect()
      .head.getFloat(4)
    val bleu = TextOps.q278BleuContamination(spark, tmp).collect()
      .head.getFloat(4)
    assert(chrf > 0.95f, s"chrf=$chrf should ignore the spacing change")
    assert(bleu < 0.8f, s"bleu=$bleu should be hurt by the spacing change")
    assert(chrf > bleu)
  }
}

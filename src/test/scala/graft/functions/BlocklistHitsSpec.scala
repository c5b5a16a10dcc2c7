package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Aho–Corasick blocklist expression: the classic textbook automaton
  * cases, overlap semantics, and the whole q280 lane against an
  * independent sliding-window count on real data.
  */
class BlocklistHitsSpec extends SparkSpec {

  private def hits(text: String, pats: String*): Seq[Int] = {
    val ac = new AcAutomaton(pats.map(_.getBytes("UTF-8")).toArray)
    val arr = ac.run(UTF8String.fromString(text))
    (0 until pats.length).map(arr.getInt)
  }

  test("the Aho–Corasick textbook case: {he, she, his, hers} over 'ushers'") {
    assert(hits("ushers", "he", "she", "his", "hers") == Seq(1, 1, 0, 1))
  }

  test("overlapping occurrences all count") {
    assert(hits("banana", "ana") == Seq(2))
    assert(hits("aaaa", "aa") == Seq(3))
    assert(hits("banana", "ban", "na", "banana") == Seq(1, 2, 1))
  }

  test("matches at start, end, and across word boundaries; empty text") {
    assert(hits("hash join beats hash", "hash join", "hash", "ash")
      == Seq(1, 2, 2))
    assert(hits("", "x") == Seq(0))
    assert(hits("x", "x") == Seq(1))
  }

  test("sparse fallback engages above the dense-state limit and equals the dense walk") {
    val textbook = Seq("he", "she", "his", "hers").map(_.getBytes("UTF-8")).toArray
    val dense = new AcAutomaton(textbook)
    val sparse = new AcAutomaton(textbook, denseStateLimit = 1)
    assert(dense.isDense && !sparse.isDense)
    for (t <- Seq("ushers", "banana", "", "shehishehers", "x" * 1000)) {
      val u = UTF8String.fromString(t)
      assert(sparse.run(u).toIntArray().toSeq == dense.run(u).toIntArray().toSeq)
    }
  }

  test("large synthetic lexicon: states exceed the limit, sparse equals dense and a naive count") {
    val rng = new scala.util.Random(42)
    val alpha = "abcd"
    def word(n: Int) = Array.fill(n)(alpha(rng.nextInt(alpha.length))).mkString
    val lexicon = (Array.fill(2000)(word(3 + rng.nextInt(6))) ++
      Seq("a", "aa", "aaa", "ab", "dcba")).distinct
    val bytes = lexicon.map(_.getBytes("UTF-8"))
    // force the fallback with a limit far below the trie's state count
    val sparse = new AcAutomaton(bytes, denseStateLimit = 16)
    val dense = new AcAutomaton(bytes, denseStateLimit = Int.MaxValue)
    assert(!sparse.isDense && dense.isDense)
    val text = word(20000)
    val u = UTF8String.fromString(text)
    val got = sparse.run(u).toIntArray().toSeq
    assert(got == dense.run(u).toIntArray().toSeq)
    // spot-check a slice against the quadratic oracle definition
    lexicon.take(50).zipWithIndex.foreach { case (p, i) =>
      val naive = (0 to text.length - p.length).count(text.startsWith(p, _))
      assert(got(i) == naive, s"pattern $p")
    }
  }

  test("q280 equals an independent per-position count on the real sf0.001 corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.TextOps.q280BlocklistHits(spark, dir)
      .as[(Long, String, Int)].collect().toSet
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = (for {
      (id, text) <- docs
      p <- graft.queries.TextOps.Blocklist
      n = (0 to text.length - p.length).count(i => text.startsWith(p, i))
      if n > 0
    } yield (id, p, n)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }
}

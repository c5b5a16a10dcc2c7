package graft.queries

import graft.SparkSpec

/** q259 fertility-by-detected-language: composition laws against the
  * two artifacts it composes — the word/char/token mass equals q251's
  * per-source totals (same corpus, same filters, same segmenter), each
  * document is detected exactly once, and the ratio columns are exact
  * quotients of the reported integer masses.
  */
class FertilityByLangSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("token/word/char mass is conserved: per-detected-language totals equal q251's per-source totals") {
    val byLang = LangModel.q259FertilityByLang(spark, dir).collect()
    val bySrc = LangModel.q251UnigramEncode(spark, dir).collect()
    assert(byLang.map(_.getLong(2)).sum == bySrc.map(_.getLong(1)).sum) // words
    assert(byLang.map(_.getLong(3)).sum == bySrc.map(_.getLong(2)).sum) // chars
    assert(byLang.map(_.getLong(4)).sum == bySrc.map(_.getLong(3)).sum) // tokens
  }

  test("every gram-bearing document is detected exactly once, and ratios are exact quotients") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = LangModel.q259FertilityByLang(spark, dir).collect()
    val nDocs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w".rlike("^[a-z]+$"))
      .select($"doc_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val (nw, nc, nt) = (r.getLong(2), r.getLong(3), r.getLong(4))
      if (nt > 0L) assert(r.getDouble(5) == nc.toDouble / nt)
      else assert(r.isNullAt(5))
      if (nw > 0L) assert(r.getDouble(6) == nt.toDouble / nw)
      else assert(r.isNullAt(6))
      // the segmenter never cuts below 1 token or above chars tokens
      assert(nt >= nw && nt <= nc)
    }
  }
}

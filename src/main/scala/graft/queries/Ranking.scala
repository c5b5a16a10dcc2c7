package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Full-text relevance ranking over the documents corpus: Okapi BM25,
  * the standard lexical scoring function (public formulation, e.g.
  * Robertson & Zaragoza 2009; Lucene's default similarity) — the
  * retrieval primitive a training-data pipeline uses for targeted
  * corpus queries ("find documents about X") alongside the embedding
  * ANN family (Similarity.scala).
  *
  * Determinism note (the q53 convention): every per-document input to
  * the score (tf, dl) and every corpus statistic (N, df, Σdl) is an
  * exact integer aggregate; the score is then ONE fixed-shape double
  * expression over those exact inputs, with the per-term parts summed
  * in fixed textual order — bit-identical in any engine evaluating the
  * same formula. `ln` is bit-verified against DuckDB on this data.
  *
  * At 100 TB: the per-document stage is a pure map-side scan (tf/dl are
  * per-row array ops, no explode); corpus stats are one all-reduce to a
  * single row, broadcast back; top-k is TakeOrderedAndProject (no global
  * sort). For ad-hoc terms at scale the df lookup would come from a
  * maintained vocabulary table (q66's df profile) instead of a rescan.
  */
object Ranking {

  private val K1 = 1.2
  private val B  = 0.75

  /** Query terms: one rare ("dup", df≈5% — carries high idf), two from
    * the corpus's flat high-frequency band. Saturation + length
    * normalization still discriminate within the flat band.
    */
  private val Terms = Seq("dup", "spark", "key")

  def q82Bm25(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import s.implicits._
    val perDoc = Tables.load(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id" +: size($"ws").cast("long").as("dl") +:
        Terms.map(t =>
          size(filter($"ws", w => w === t)).cast("long").as(s"tf_$t")): _*)
    val corpus = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum($"dl").as("sum_dl") +:
        Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val avgdl: Column = $"sum_dl".cast("double") / $"n_docs"
    // Per-term BM25 part — the expression SHAPE (parenthesization,
    // constant literals, operand order) mirrors q82Bm25Sql exactly so
    // double results are bit-identical.
    def part(t: String): Column = {
      val tf = col(s"tf_$t"); val df = col(s"df_$t")
      log(($"n_docs" - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0)) *
        (tf * lit(2.2)) /
        (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * $"dl" / avgdl))
    }
    perDoc.crossJoin(broadcast(corpus))
      .select($"doc_id" +: $"dl" +: Terms.map(t => col(s"tf_$t")) :+
        Terms.map(part).reduce(_ + _).as("score"): _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  val q82Bm25Sql: String = {
    def tfCol(t: String) =
      s"CAST(len(list_filter(ws, w -> w = '$t')) AS BIGINT) AS tf_$t"
    def dfCol(t: String) =
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t"
    def partSql(t: String) =
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * " +
        s"(tf_$t * 2.2) / " +
        s"(tf_$t + $K1 * (1.0 - $B + $B * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
      |    ${Terms.map(tfCol).mkString(",\n    ")}
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    ${Terms.map(dfCol).mkString(",\n    ")}
      |  FROM d)
      |SELECT doc_id, dl, ${Terms.map(t => s"tf_$t").mkString(", ")},
      |  ${Terms.map(partSql).mkString("\n  + ")} AS score
      |FROM d, c
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }
}

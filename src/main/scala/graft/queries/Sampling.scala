package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic corpus sampling — the training-data counterpart of
  * q39's split gate: weighted reservoir sampling (Efraimidis–Spirakis)
  * and exact per-stratum subsampling. Both derive their "randomness"
  * from the q39 md5 idiom, so the sample is a pure function of the
  * corpus and the DuckDB oracle replays it exactly.
  */
object Sampling {

  /** The q39 stable-uniform gate shifted into (0, 1]: the first 8 md5
    * hex chars as a 32-bit integer, +1 so `ln` never sees zero.
    */
  private def u01(tag: String, id: Column): Column =
    (conv(substring(md5(concat(lit(tag), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") + 1) / lit(4294967296.0)

  /** q124: weighted sampling without replacement, Efraimidis–Spirakis:
    * each doc draws a stable uniform u and ranks by `ln(u) / w` (the
    * log form of the classic `u^(1/w)` key — monotone-identical, and
    * `ln` agrees cross-engine to 1 ULP, hence the 12-dp key rounding
    * below); the top-k keys ARE a weighted sample without replacement.
    * Weight = n_chars, so long documents are proportionally favored —
    * the token-budget-aware subsample a mixture builder wants. The
    * whole query is one scan + `TakeOrderedAndProject`: no global sort,
    * no shuffle beyond top-k merge, the 100 TB plan.
    */
  def q124WeightedSample(s: SparkSession, dir: String, k: Int = 200): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", $"n_chars",
        // round to 12 dp: ln agrees cross-engine only to ~1 ULP, and the
        // rounded key is both the output AND the order key, so the
        // selected top-k set is identical by construction
        round(log(u01("wsamp:", $"doc_id")) / $"n_chars".cast("double"), 12)
          .as("es_key"))
      .orderBy($"es_key".desc, $"doc_id")
      .limit(k)
  }

  val q124WeightedSampleSql: String =
    """SELECT doc_id, source, n_chars,
      |  round(ln((CAST(('0x' || substring(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
      |     / 4294967296.0) / CAST(n_chars AS DOUBLE), 12) AS es_key
      |FROM documents
      |ORDER BY es_key DESC, doc_id LIMIT 200""".stripMargin

  /** q125: exact per-stratum subsample — k docs per source, chosen by
    * the stable md5 order (a deterministic reservoir per stratum). The
    * rank-filter form compiles to Spark's WindowGroupLimit: each map
    * task pre-prunes to its own top-k per stratum BEFORE the exchange,
    * so the shuffle carries O(k · strata · tasks) rows, not the corpus
    * — that optimization is exactly why this beats a
    * collect_list-and-slice formulation at 100 TB.
    */
  def q125StratifiedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import s.implicits._
    val byStratum = Window.partitionBy($"source")
      .orderBy(md5(concat(lit("strat:"), $"doc_id".cast("string"))), $"doc_id")
    Tables.load(s, dir, "documents")
      .select($"source", $"doc_id")
      .withColumn("rn", row_number().over(byStratum).cast("long"))
      .filter($"rn" <= k)
      .orderBy($"source", $"rn")
  }

  val q125StratifiedSampleSql: String =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
      |  FROM documents)
      |WHERE rn <= 50 ORDER BY source, rn""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table
  * (`Array[Float]`, dim 64): brute-force cosine top-k as the exact
  * baseline, and an IVF-bucketed variant as the 100 TB scale path.
  *
  * Cosine is computed by the native codegen'd CosineSimilarity expression
  * with sequential double accumulation — the same left-to-right summation
  * DuckDB's `list_sum` performs, so scores compare bit-for-bit against
  * the oracle.
  */
object Similarity {

  private val Dim = 64
  private val K   = 3

  /** Cosine via the native codegen'd expression (graft.functions
    * .CosineSimilarity): one fused dot+norms loop per pair, same
    * sequential-double accumulation as DuckDB's list_sum fold — so the
    * score still compares bit-for-bit against the oracle.
    */
  private def cosine(s: SparkSession, a: Column, b: Column): Column = {
    graft.GraftExtensions.register(s)
    // call_function resolves through the registry — no fragile
    // Column.toString -> SQL-string round-trip
    call_function("cosine_similarity", a, b)
  }

  /** Brute-force cosine top-k: broadcast the query set, one scan of the
    * corpus, per-partition top-k heap + k-row merge (TakeOrdered via the
    * rank-filter window on qid). The exact baseline every ANN variant is
    * measured against.
    */
  def q50AnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid")
    e.select($"vec_id".as("nid"), $"embedding".as("ne"))
      .crossJoin(broadcast(q))
      .filter($"nid" =!= $"qid")
      .withColumn("cos_sim", cosine(s, $"qe", $"ne"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= K)
      .select($"qid", $"rnk".cast("long").as("rnk"), $"nid", $"cos_sim")
      .orderBy($"qid", $"rnk")
  }

  val q50AnnBruteSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT qid, e.vec_id AS nid,
      |    ${dot("qe", "e.embedding")} /
      |    (sqrt(${dot("qe", "qe")}) * sqrt(${dot("e.embedding", "e.embedding")})) AS cos_sim
      |  FROM q, embeddings e WHERE e.vec_id <> qid)
      |SELECT qid, rnk, nid, cos_sim
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rnk
      |      FROM scored)
      |WHERE rnk <= $K ORDER BY qid, rnk""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs (the dedup family's embedding
    * variant): all pairs with cosine ≥ τ, exact via the native expression
    * over a self cross-join. At 100 TB the candidate generation reuses
    * the IVF/LSH bucketing of q51 (pairs within a bucket only) — here the
    * corpus-sized exact form doubles as its own oracle-checkable
    * ground truth. τ sits below this corpus's max cosine (~0.51) so the
    * result is non-empty.
    */
  def q43EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
    val a = e.select($"vec_id".as("d1"), $"embedding".as("x"))
    val b = e.select($"vec_id".as("d2"), $"embedding".as("y"))
    a.crossJoin(broadcast(b))
      .filter($"d1" < $"d2")
      .withColumn("cos_sim", cosine(s, $"x", $"y"))
      .filter($"cos_sim" >= 0.45)
      .select($"d1", $"d2", $"cos_sim")
      .orderBy($"d1", $"d2")
  }

  val q43EmbedNearDupSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""SELECT a.vec_id AS d1, b.vec_id AS d2,
      |  ${dot("a.embedding", "b.embedding")} /
      |  (sqrt(${dot("a.embedding", "a.embedding")}) * sqrt(${dot("b.embedding", "b.embedding")})) AS cos_sim
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id
      |  AND ${dot("a.embedding", "b.embedding")} /
      |      (sqrt(${dot("a.embedding", "a.embedding")}) * sqrt(${dot("b.embedding", "b.embedding")})) >= 0.45
      |ORDER BY d1, d2""".stripMargin
  }

  /** IVF-bucketed ANN — the scale path: assign every vector to its nearest
    * of C fixed centroids (deterministic: the vectors with vec_id < C serve
    * as the coarse codebook), then probe only the `nprobe` nearest
    * centroid buckets per query. At 100 TB: the corpus is partitioned by
    * centroid id (one shuffle, or a bucketed table layout), each query
    * touches nprobe/C of the data. Approximate by construction — recall vs
    * q50 is asserted in the test suite, not by the SQL oracle.
    */
  def q51AnnIvf(s: SparkSession, dir: String, nCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings")
    val cent = e.filter($"vec_id" < nCentroids)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    // assign: nearest centroid per corpus vector (broadcast C centroids)
    val wAssign = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cid")
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("csim", cosine(s, $"embedding", $"ce"))
      .withColumn("arnk", row_number().over(wAssign))
      .filter($"arnk" === 1)
      .select($"vec_id".as("nid"), $"embedding".as("ne"), $"cid")
    // probe: nprobe nearest centroids per query
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val wProbe = Window.partitionBy($"qid").orderBy($"csim".desc, $"cid")
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("csim", cosine(s, $"qe", $"ce"))
      .withColumn("prnk", row_number().over(wProbe))
      .filter($"prnk" <= nProbe)
      .select($"qid", $"qe", $"cid")
    // search only the probed buckets
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid")
    probes.join(assigned, "cid")
      .filter($"nid" =!= $"qid")
      .withColumn("cos_sim", cosine(s, $"qe", $"ne"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= K)
      .select($"qid", $"rnk".cast("long").as("rnk"), $"nid", $"cos_sim")
      .orderBy($"qid", $"rnk")
  }
}

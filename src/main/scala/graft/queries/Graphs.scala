package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative link-analysis over a behavior graph derived from the event
  * stream — the corpus-curation analogue is ranking sources/domains by
  * how traffic (or citation) flows between them, a standard signal for
  * weighting web-crawl subsets in a training mixture (PageRank; Page et
  * al. 1999, public formulation).
  *
  * Determinism (the q53/q82 convention): the graph — edge weights,
  * out-degrees, node count — is exact integer aggregates; each rank
  * update is one fixed-shape double expression, and the per-node mass
  * sum folds contributions in src order (sorted fold, bit-identical to
  * the oracle's `list_sum(list(... ORDER BY src))`).
  *
  * At 100 TB: each iteration is one shuffle (contributions grouped by
  * dst) over the edge list — the textbook distributed PageRank shape;
  * the node-count frame is a broadcast scalar, never a driver collect.
  * A fixed iteration count keeps the plan static (no driver-side
  * convergence loop over actions); real deployments pick iters by
  * graph diameter, exactly as here.
  */
object Graphs {

  /** q103: 3-iteration weighted PageRank over the user event-transition
    * graph. Nodes = event types; an edge src→dst with weight w means
    * "users moved from a src event to a dst event w times" (consecutive
    * events per user, ordered by time). Teleport 0.15 and damping 0.85
    * are independent literals on both engines (never derived from each
    * other — 1.0-0.85 rounds differently than the 0.15 literal).
    */
  def q103PageRank(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val edges = ev
      .withColumn("src", lag($"event_type", 1).over(byUser))
      .filter($"src".isNotNull)
      .groupBy($"src", $"event_type".as("dst"))
      .agg(count(lit(1)).as("wt"))
    val outw = edges.groupBy($"src").agg(sum($"wt").as("outw"))
    val e = edges.join(broadcast(outw), "src")
    val nodes = ev.select($"event_type".as("node")).distinct()
    // node count as a broadcast 1-row frame: the formula needs N but a
    // driver-side count() would serialize the job graph
    val nc = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nc))
      .select($"node", (lit(1.0) / $"n_nodes").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst", $"src", ($"rank" * $"wt" / $"outw").as("c"))
      val mass = contrib.groupBy($"dst").agg(
        aggregate(
          transform(array_sort(collect_list(struct($"src", $"c"))),
            x => x.getField("c")),
          lit(0.0), (acc, x) => acc + x).as("mass"))
      ranks = nodes.crossJoin(broadcast(nc))
        .join(mass.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node",
          (lit(0.15) / $"n_nodes" + lit(0.85) * coalesce($"mass", lit(0.0)))
            .as("rank"))
    }
    ranks.join(outw.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select($"node", coalesce($"outw", lit(0L)).as("out_weight"), $"rank")
      .orderBy($"node")
  }

  /** Oracle: the same three iterations unrolled as CTEs, mass summed via
    * `list_sum(list(contrib ORDER BY src))` — the sequential fold that
    * bit-matches the Spark side's sorted-array aggregate.
    */
  val q103PageRankSql: String = {
    def massCte(i: Int, prev: String) =
      s"""m$i AS (
         |  SELECT e.dst,
         |    list_sum(list(r.rank * e.wt / e.outw ORDER BY e.src)) AS mass
         |  FROM e JOIN $prev r ON r.node = e.src GROUP BY e.dst),
         |r$i AS (
         |  SELECT b.node,
         |    CAST(0.15 AS DOUBLE) / b.n_nodes
         |      + CAST(0.85 AS DOUBLE) * COALESCE(m$i.mass, CAST(0 AS DOUBLE)) AS rank
         |  FROM (SELECT node, n_nodes FROM nodes, nc) b
         |  LEFT JOIN m$i ON m$i.dst = b.node)""".stripMargin
    s"""WITH tr AS (
       |  SELECT event_type AS dst,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
       |  FROM events),
       |edges AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt
       |  FROM tr WHERE src IS NOT NULL GROUP BY src, dst),
       |o AS (SELECT src, CAST(SUM(wt) AS BIGINT) AS outw FROM edges GROUP BY src),
       |e AS (SELECT edges.src, edges.dst, edges.wt, o.outw
       |      FROM edges JOIN o ON o.src = edges.src),
       |nodes AS (SELECT DISTINCT event_type AS node FROM events),
       |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n_nodes AS rank FROM nodes, nc),
       |${massCte(1, "r0")},
       |${massCte(2, "r1")},
       |${massCte(3, "r2")}
       |SELECT r3.node, CAST(COALESCE(o.outw, 0) AS BIGINT) AS out_weight, r3.rank
       |FROM r3 LEFT JOIN o ON o.src = r3.node
       |ORDER BY r3.node""".stripMargin
  }
}

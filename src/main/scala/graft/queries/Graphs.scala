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
  *
  * One deliberate oracle-discipline trade-off: the per-node sorted
  * fold materializes a node's in-neighbor contributions as one array,
  * which for a web-scale hub node (unbounded in-degree) would be the
  * bottleneck. That fold exists ONLY to make the double sum
  * bit-reproducible against the oracle; the production form replaces
  * `orderedSum` with a plain `sum($"c")` — same shuffle shape, no
  * array, order-free within 1-2 ulp — and everything else unchanged.
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

  /** q113: 3-round synchronous label propagation over the same
    * event-transition graph — community detection (Raghavan et al. 2007,
    * public formulation), made deterministic: edges are symmetrized and
    * weight-summed, each node adopts the label with the highest total
    * incident weight among its neighbours' current labels (ties → the
    * lexicographically smallest label; isolated nodes keep their own),
    * and every round is exact integer aggregates + one argmax window —
    * no floating point anywhere, so the unrolled-CTE oracle matches by
    * construction. Per round: one label-mass shuffle + one per-node
    * window — the same one-shuffle-per-iteration scale shape as q103.
    */
  /** Symmetrized, weight-summed undirected event-transition multigraph
    * — the q113/q238 edge frame (src, dst, wt), with both directions
    * present and self-loop weights doubled by the symmetrization.
    */
  private def symmetrizedEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val directed = ev
      .withColumn("src", lag($"event_type", 1).over(byUser))
      .filter($"src".isNotNull)
      .groupBy($"src", $"event_type".as("dst"))
      .agg(count(lit(1)).as("wt"))
    // symmetrize INTERNALLY (the ComponentsSpec lesson): an undirected
    // neighbourhood, with parallel edge weights summed
    directed
      .unionByName(directed.select($"dst".as("src"), $"src".as("dst"), $"wt"))
      .groupBy($"src", $"dst").agg(sum($"wt").as("wt"))
  }

  /** The q113 synchronous rounds over a prebuilt edge frame: returns
    * the final (node, lbl) assignment.
    */
  private def labelPropOn(s: SparkSession, edges: DataFrame, nodes: DataFrame,
      rounds: Int): DataFrame = {
    import s.implicits._
    var labels = nodes.select($"node", $"node".as("lbl"))
    val byMass = Window.partitionBy($"node").orderBy($"w".desc, $"lbl")
    for (_ <- 1 to rounds) {
      val mass = edges.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy($"dst".as("node"), $"lbl").agg(sum($"wt").as("w"))
      val winner = mass.withColumn("rk", row_number().over(byMass))
        .filter($"rk" === 1).select($"node", $"lbl".as("new_lbl"))
      labels = labels.join(winner, Seq("node"), "left")
        .select($"node", coalesce($"new_lbl", $"lbl").as("lbl"))
    }
    labels
  }

  def q113LabelProp(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    import s.implicits._
    val edges = symmetrizedEdges(s, dir)
    val nodes = Tables.load(s, dir, "events")
      .select($"event_type".as("node")).distinct()
    labelPropOn(s, edges, nodes, rounds)
      .select($"node", $"lbl".as("community")).orderBy($"node")
  }

  /** The label-propagation CTE chain (graph build + 3 unrolled rounds,
    * final labels in `l3`, edges in `e`) — shared by the q113 and q238
    * oracles.
    */
  private val labelPropCtes: String = {
    def round(i: Int, prev: String) =
      s"""m$i AS (
         |  SELECT e.dst AS node, r.lbl, CAST(SUM(e.wt) AS BIGINT) AS w
         |  FROM e JOIN $prev r ON r.node = e.src GROUP BY 1, 2),
         |w$i AS (
         |  SELECT node, lbl AS new_lbl FROM (
         |    SELECT node, lbl,
         |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rk
         |    FROM m$i) WHERE rk = 1),
         |l$i AS (
         |  SELECT p.node, COALESCE(w$i.new_lbl, p.lbl) AS lbl
         |  FROM $prev p LEFT JOIN w$i ON w$i.node = p.node)""".stripMargin
    s"""tr AS (
       |  SELECT event_type AS dst,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
       |  FROM events),
       |d AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt
       |  FROM tr WHERE src IS NOT NULL GROUP BY src, dst),
       |e AS (
       |  SELECT src, dst, CAST(SUM(wt) AS BIGINT) AS wt FROM (
       |    SELECT src, dst, wt FROM d
       |    UNION ALL SELECT dst AS src, src AS dst, wt FROM d)
       |  GROUP BY src, dst),
       |l0 AS (SELECT DISTINCT event_type AS node, event_type AS lbl FROM events),
       |${round(1, "l0")},
       |${round(2, "l1")},
       |${round(3, "l2")}""".stripMargin
  }

  val q113LabelPropSql: String =
    s"""WITH $labelPropCtes
       |SELECT node, lbl AS community FROM l3 ORDER BY node""".stripMargin

  /** q238: Newman–Girvan weighted modularity TRAJECTORY of the q113
    * label propagation — the evaluation a community detector owes its
    * consumer, reported per round: Q = Σ_c [ e_c/2m − (d_c/2m)² ]
    * (Newman 2004, weighted form) over the symmetric weight matrix,
    * where e_c is intra-community weight, d_c the community strength
    * sum, 2m the total weight of the symmetrized edge frame
    * (conventions: both directions present, self-loop weight doubled
    * by the symmetrization — stated so the number reproduces). Round 0
    * scores the singleton partition; rounds 1–3 score each propagation
    * step — on this dense transition graph the trajectory shows the
    * coarsening finding NO real structure (Q never rises above the
    * singleton baseline before collapsing to the trivial Q = 0 single
    * community), which is exactly what a dense near-complete graph
    * should report and why the trajectory, not one number, is the
    * honest output. Every Q folds its bounded per-community frame in
    * ascending-community order (the q225 discipline) — doubles
    * bit-match the oracle.
    *
    * Scale shape: the corpus-sized work is the one window + one
    * (src, dst) aggregate building the graph; per round, two
    * node-keyed label joins and three bounded aggregates. Label frames
    * checkpoint once per round — no per-consumer recompute (the q218
    * lesson).
    */
  def q238Modularity(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    import s.implicits._
    val e = symmetrizedEdges(s, dir).localCheckpoint(true)
    val nodes = Tables.load(s, dir, "events")
      .select($"event_type".as("node")).distinct()
    val twom = e.agg(sum($"wt").as("twom"))
    val strength = e.groupBy($"src".as("node")).agg(sum($"wt").as("k"))
    def qOf(r: Int, lbl: DataFrame): DataFrame = {
      val kc = lbl.join(strength, Seq("node"), "left")
        .groupBy($"lbl".as("community"))
        .agg(sum(coalesce($"k", lit(0L))).as("degree_sum"))
      val iw = e
        .join(lbl.select($"node".as("src"), $"lbl".as("c_src")), "src")
        .join(lbl.select($"node".as("dst"), $"lbl".as("c_dst")), "dst")
        .filter($"c_src" === $"c_dst")
        .groupBy($"c_src".as("community"))
        .agg(sum($"wt").as("internal_weight"))
      val cc = kc.join(iw, Seq("community"), "left")
        .crossJoin(broadcast(twom))
        .select($"community",
          (coalesce($"internal_weight", lit(0L)).cast("double") / $"twom".cast("double")
            - ($"degree_sum".cast("double") / $"twom".cast("double"))
            * ($"degree_sum".cast("double") / $"twom".cast("double"))).as("contrib"))
      cc.agg(count(lit(1)).as("n_communities"),
          LangModel.orderedSum($"community", $"contrib").as("q"))
        .select(lit(r.toLong).as("round"), $"n_communities", $"q")
    }
    var labels = nodes.select($"node", $"node".as("lbl")).localCheckpoint(true)
    var out = qOf(0, labels)
    val byMass = Window.partitionBy($"node").orderBy($"w".desc, $"lbl")
    for (r <- 1 to rounds) {
      val mass = e.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy($"dst".as("node"), $"lbl").agg(sum($"wt").as("w"))
      val winner = mass.withColumn("rk", row_number().over(byMass))
        .filter($"rk" === 1).select($"node", $"lbl".as("new_lbl"))
      labels = labels.join(winner, Seq("node"), "left")
        .select($"node", coalesce($"new_lbl", $"lbl").as("lbl"))
        .localCheckpoint(true) // read by qOf (×3 joins) and the next round
      out = out.unionByName(qOf(r, labels))
    }
    out.select($"round", $"n_communities", $"q".cast("float").as("modularity"))
      .orderBy($"round")
  }

  val q238ModularitySql: String = {
    def qCte(r: Int) =
      s"""kc$r AS (
         |  SELECT l.lbl AS community, CAST(SUM(COALESCE(st.k, 0)) AS BIGINT) AS degree_sum
         |  FROM l$r l LEFT JOIN st ON st.node = l.node GROUP BY 1),
         |iw$r AS (
         |  SELECT ls.lbl AS community, CAST(SUM(e.wt) AS BIGINT) AS internal_weight
         |  FROM e JOIN l$r ls ON ls.node = e.src JOIN l$r ld ON ld.node = e.dst
         |  WHERE ls.lbl = ld.lbl GROUP BY 1),
         |cc$r AS (
         |  SELECT kc$r.community,
         |    CAST(COALESCE(iw$r.internal_weight, 0) AS DOUBLE) / CAST(tm.twom AS DOUBLE)
         |      - (CAST(kc$r.degree_sum AS DOUBLE) / CAST(tm.twom AS DOUBLE))
         |        * (CAST(kc$r.degree_sum AS DOUBLE) / CAST(tm.twom AS DOUBLE)) AS contrib
         |  FROM kc$r LEFT JOIN iw$r ON iw$r.community = kc$r.community CROSS JOIN tm),
         |q$r AS (
         |  SELECT CAST($r AS BIGINT) AS round,
         |    CAST(COUNT(*) AS BIGINT) AS n_communities,
         |    list_sum(list(contrib ORDER BY community)) AS q
         |  FROM cc$r)""".stripMargin
    s"""WITH $labelPropCtes,
      |tm AS (SELECT CAST(SUM(wt) AS BIGINT) AS twom FROM e),
      |st AS (SELECT src AS node, CAST(SUM(wt) AS BIGINT) AS k FROM e GROUP BY 1),
      |${(0 to 3).map(qCte).mkString(",\n")}
      |SELECT round, n_communities, CAST(q AS FLOAT) AS modularity FROM (
      |  SELECT * FROM q0 UNION ALL SELECT * FROM q1
      |  UNION ALL SELECT * FROM q2 UNION ALL SELECT * FROM q3)
      |ORDER BY round""".stripMargin
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

  /** q260 — HITS hubs & authorities (Kleinberg 1999, "Authoritative
    * Sources in a Hyperlinked Environment"): the link-analysis sibling
    * of q103's PageRank over the SAME weighted event-transition graph
    * — a node is a good AUTHORITY if good hubs point at it, a good HUB
    * if it points at good authorities. `iters` synchronous rounds of
    * a(v) = Σ_{u→v} w·h(u) then h(u) = Σ_{u→v} w·a(v) (the classic
    * a-then-h update), each re-normalized to max = 10⁶.
    *
    * Exactness: the q236 quantized-power-iteration recipe — scores
    * live as micro-unit BIGINTs, every distributed sum is an exact
    * integer sum of wt·score products (order-free, map-side
    * combinable), and the normalization floor(s·10⁶ / max) is an
    * integral division both engines floor identically on non-negative
    * inputs. Because s is itself bounded by Σwt·10⁶, the ·10⁶
    * normalization numerator would overflow int64 once Σwt exceeds
    * ~9.2·10⁶ — so the multiply-divide runs in 128-bit integer space
    * (DECIMAL(38,0) on Spark, HUGEINT on DuckDB; identical floor
    * semantics, result always ≤ 10⁶ so the BIGINT cast back is safe).
    * No floating point until the final ÷10⁶ presentation. Headroom is
    * then set by the SUM itself: Σwt·10⁶ must stay under 2⁶³ — fine
    * through ~9·10¹² transitions; past that drop the quantization
    * scale (same plan).
    *
    * At 100 TB: edges aggregate once from the corpus (the only
    * corpus-sized shuffle, shared shape with q103); per round two
    * edge-keyed joins against node-sized score frames + two bounded
    * aggregates + two 1-row maxes riding broadcasts — one shuffle per
    * half-step, state bounded by |nodes|.
    */
  def q260Hits(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val Q = 1000000L
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val edges = ev
      .withColumn("src", lag($"event_type", 1).over(byUser))
      .filter($"src".isNotNull)
      .groupBy($"src", $"event_type".as("dst"))
      .agg(count(lit(1)).as("wt"))
      .localCheckpoint(true) // probed twice per round, 2·iters rounds
    val nodes = ev.select($"event_type".as("node")).distinct()
      .localCheckpoint(true)
    var auth = nodes.select($"node", lit(Q).as("aq"))
    var hub = nodes.select($"node", lit(Q).as("hq"))
    for (_ <- 1 to iters) {
      val aSum = edges.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy($"dst".as("node")).agg(sum($"wt" * $"hq").as("s"))
      val aMax = aSum.agg(max($"s").as("mx"))
      auth = nodes.join(aSum, Seq("node"), "left")
        .crossJoin(broadcast(aMax))
        .select($"node",
          expr(s"(cast(coalesce(s, 0L) as decimal(38,0)) * $Q) div mx")
            .cast("long").as("aq"))
        .localCheckpoint(true)
      val hSum = edges.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy($"src".as("node")).agg(sum($"wt" * $"aq").as("s"))
      val hMax = hSum.agg(max($"s").as("mx"))
      hub = nodes.join(hSum, Seq("node"), "left")
        .crossJoin(broadcast(hMax))
        .select($"node",
          expr(s"(cast(coalesce(s, 0L) as decimal(38,0)) * $Q) div mx")
            .cast("long").as("hq"))
        .localCheckpoint(true)
    }
    auth.join(hub, "node")
      .select($"node", $"aq".as("authority_q"), $"hq".as("hub_q"),
        ($"aq".cast("double") / Q).as("authority"),
        ($"hq".cast("double") / Q).as("hub"))
      .orderBy($"node")
  }

  def q260HitsSql(iters: Int = 3): String = {
    val Q = 1000000L
    def roundCtes(i: Int) =
      s"""asum$i AS (
         |  SELECT e.dst AS node, CAST(SUM(e.wt * h.hq) AS BIGINT) AS s
         |  FROM edges e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1),
         |amax$i AS (SELECT MAX(s) AS mx FROM asum$i),
         |a$i AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(CAST(COALESCE(t.s, 0) AS HUGEINT) * $Q // mx AS BIGINT) AS aq
         |  FROM nodes n LEFT JOIN asum$i t ON t.node = n.node, amax$i),
         |hsum$i AS (
         |  SELECT e.src AS node, CAST(SUM(e.wt * a.aq) AS BIGINT) AS s
         |  FROM edges e JOIN a$i a ON a.node = e.dst GROUP BY 1),
         |hmax$i AS (SELECT MAX(s) AS mx FROM hsum$i),
         |h$i AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(CAST(COALESCE(t.s, 0) AS HUGEINT) * $Q // mx AS BIGINT) AS hq
         |  FROM nodes n LEFT JOIN hsum$i t ON t.node = n.node, hmax$i)""".stripMargin
    s"""WITH tr AS (
       |  SELECT event_type AS dst,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
       |  FROM events),
       |edges AS MATERIALIZED (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt
       |  FROM tr WHERE src IS NOT NULL GROUP BY src, dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT event_type AS node FROM events),
       |h0 AS (SELECT node, CAST($Q AS BIGINT) AS hq FROM nodes),
       |${(1 to iters).map(roundCtes).mkString(",\n")}
       |SELECT a$iters.node, a$iters.aq AS authority_q, h$iters.hq AS hub_q,
       |  CAST(a$iters.aq AS DOUBLE) / $Q AS authority,
       |  CAST(h$iters.hq AS DOUBLE) / $Q AS hub
       |FROM a$iters JOIN h$iters ON h$iters.node = a$iters.node
       |ORDER BY a$iters.node""".stripMargin
  }

  /** q168: bounded-hop single-source shortest paths (Bellman–Ford,
    * `hops` relaxation rounds) over the weighted part-co-occurrence
    * graph: nodes = parts, an undirected edge (p1, p2) with integer
    * weight `1000 − pair_cnt` for pairs co-ordered ≥ 2 times (stronger
    * association = shorter edge). Source = the smallest node id in the
    * edge set; output = the exact minimum path weight to every node
    * reachable in ≤ `hops` edges — all-integer, so cross-engine
    * equality is exact.
    *
    * Scale shape: each round is ONE edge-keyed join (current distances
    * × adjacency) + one min-aggregation on the node key — the textbook
    * distributed Bellman–Ford; `hops` bounds the rounds the way a graph
    * diameter budget does in production. The candidate-pair graph is
    * sparse by the q161 apriori argument; nothing in any round is
    * corpus-sized except the first basket aggregation. The oracle is
    * the ≤`hops`-edge path enumeration (recursive CTE) this operator
    * exists to avoid.
    */
  def q168ShortestPath(s: SparkSession, dir: String, hops: Int = 4): DataFrame = {
    import s.implicits._
    val baskets = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey".as("k"), $"l_partkey".as("p")).distinct()
    val pairs = baskets.as("a").join(baskets.as("b"),
        $"a.k" === $"b.k" && $"a.p" < $"b.p")
      .groupBy($"a.p".as("p1"), $"b.p".as("p2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter($"pair_cnt" >= 2)
    val edges = pairs
      .select($"p1".as("u"), $"p2".as("v"), (lit(1000L) - $"pair_cnt").as("w"))
      .union(pairs.select($"p2".as("u"), $"p1".as("v"),
        (lit(1000L) - $"pair_cnt").as("w")))
      .localCheckpoint(true) // read every round; cut the basket lineage
    val deg = edges.groupBy($"u").agg(count(lit(1)).as("deg"))
    val src = deg.orderBy($"deg".desc, $"u".asc).limit(1)
    var dist = src.select($"u".as("node"), lit(0L).as("d"))
    for (_ <- 1 to hops) {
      dist = dist.union(
          dist.join(edges, dist("node") === edges("u"))
            .select($"v".as("node"), ($"d" + $"w").as("d")))
        .groupBy($"node").agg(min($"d").as("d"))
    }
    dist.select($"node", $"d".as("dist")).orderBy($"node")
  }

  val q168ShortestPathSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
      |pairs AS (
      |  SELECT a.p AS p1, b2.p AS p2, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      |  FROM b a JOIN b b2 ON a.k = b2.k AND a.p < b2.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (
      |  SELECT p1 AS u, p2 AS v, 1000 - pair_cnt AS w FROM pairs
      |  UNION ALL
      |  SELECT p2 AS u, p1 AS v, 1000 - pair_cnt AS w FROM pairs),
      |src AS (SELECT u AS s FROM (
      |  SELECT u, COUNT(*) AS deg FROM e GROUP BY u
      |  ORDER BY deg DESC, u LIMIT 1)),
      |walk AS (
      |  SELECT s AS node, CAST(0 AS BIGINT) AS d, 0 AS hops FROM src
      |  UNION ALL
      |  SELECT e.v, walk.d + e.w, hops + 1
      |  FROM walk JOIN e ON e.u = walk.node WHERE hops < 4)
      |SELECT node, CAST(MIN(d) AS BIGINT) AS dist
      |FROM walk GROUP BY node ORDER BY node""".stripMargin

  /** q203: degree assortativity of the co-presence graph — do
    * highly-connected users overlap with other hubs (assortative,
    * r > 0) or with loners (disassortative, r < 0)? Newman's r is the
    * Pearson correlation of endpoint degrees over the DOUBLED edge
    * list (each edge counted in both orientations), which collapses to
    * one fixed-shape double expression over four exact integer sums —
    * every candidate value is a closed-form function of exact
    * integers, so the double stays double (the q143/q19 rule). Edges
    * are q198's interval-overlap pairs (already deduplicated, one row
    * per user pair); degrees are one symmetrized aggregate; the two
    * degree joins key on the edge endpoints. The denominator
    * degenerates only on exactly-regular graphs — guarded with a CASE
    * on both engines (the q151 rule).
    */
  def q203Assortativity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the shared (memoized, checkpointed) pair table — no presentation
    // sort, no per-branch recompute of the sessionize + interval-join
    // pipeline (pre-memo this lane paid 3 full recomputes without its
    // own lineage cut; the cache makes all three branches read the
    // same materialized blocks)
    val edges = Timeseries.intervalOverlapPairs(s, dir)
      .select($"user_a".as("ua"), $"user_b".as("ub"))
    val deg = edges.select($"ua".as("u"))
      .unionAll(edges.select($"ub".as("u")))
      .groupBy($"u").agg(count(lit(1)).as("deg"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val ed = edges
      .join(deg.select($"u".as("ua"), $"deg".as("da")), "ua")
      .join(deg.select($"u".as("ub"), $"deg".as("db")), "ub")
    val sums = ed.agg(
      count(lit(1)).as("n_edges"),
      sum($"da" + $"db").as("sx"),
      sum($"da" * $"da" + $"db" * $"db").as("sxx"),
      sum(lit(2L) * $"da" * $"db").as("sxy"))
    sums.crossJoin(broadcast(nNodes))
      .select($"n_nodes", $"n_edges",
        when(lit(2L) * $"n_edges" * $"sxx" - $"sx" * $"sx" =!= 0L,
          (lit(2L) * $"n_edges" * $"sxy" - $"sx" * $"sx").cast("double")
            / (lit(2L) * $"n_edges" * $"sxx" - $"sx" * $"sx"))
          .as("assortativity"))
  }

  /** q215: k-core decomposition of the co-presence graph — the densest
    * stable community skeleton: repeatedly peel nodes with fewer than
    * k surviving neighbors until a fixpoint; what remains is the
    * subgraph where EVERYONE keeps ≥ k connections (the standard
    * cohesion primitive next to q94's triangles and q203's
    * assortativity). Registered as the BOUNDED-ROUND form (the q72/
    * q168 discipline — a recursive-with-aggregation oracle does not
    * exist in SQL): both engines run exactly `rounds` peel rounds; the
    * spec separately proves the fixpoint is reached well inside that
    * budget on this data, so the output IS the true k-core (k = 2 as
    * registered). Per round:
    * one degree aggregate + the induced-subgraph double equijoin, each
    * round checkpointed (one job per round, the Components
    * discipline); at 100 TB rounds are O(diameter-ish) and each is a
    * key-partitioned join, never a cross product.
    */
  def q215Kcore(s: SparkSession, dir: String, k: Int = 2,
      rounds: Int = 10): DataFrame = {
    import s.implicits._
    // REPEAT co-presence only (≥2 overlapping session pairs): one-off
    // overlaps make the graph near-complete and the peel trivial; the
    // repeat graph is sparse enough that the peel actually carves (k=2
    // keeps a 33-node core of 97 candidates at sf0.01, 7 peel rounds)
    // the shared (memoized) pair table — q198's aggregate WITHOUT its
    // presentation sort, which a graph consumer never needed
    val pairs = Timeseries.intervalOverlapPairs(s, dir)
      .filter($"n_overlaps" >= 2)
      .select($"user_a", $"user_b").localCheckpoint(true)
    var e = pairs.select($"user_a".as("u"), $"user_b".as("v"))
      .unionAll(pairs.select($"user_b".as("u"), $"user_a".as("v")))
      .localCheckpoint(true)
    // peeling is MONOTONE (e_{r+1} ⊆ e_r), so an unchanged edge COUNT
    // means an unchanged edge set and every remaining round is a no-op:
    // skipping them computes the identical result as running all
    // `rounds` (which is what the oracle does), for free when the
    // fixpoint lands early. The count is over an already-checkpointed
    // frame — one cheap job per round.
    var prevCount = e.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val surv = e.groupBy($"u").agg(count(lit(1)).as("d"))
        .filter($"d" >= k).select($"u")
      e = e.join(surv, "u")
        .join(surv.withColumnRenamed("u", "v"), "v")
        .select($"u", $"v")
        .localCheckpoint(true)
      val c = e.count()
      stable = c == prevCount
      prevCount = c
      r += 1
    }
    e.groupBy($"u".as("node")).agg(count(lit(1)).as("core_degree"))
      .orderBy($"node")
  }

  def q215KcoreSql(k: Int = 2, rounds: Int = 10): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""n${r - 1} AS MATERIALIZED (
         |  SELECT u FROM e${r - 1} GROUP BY u HAVING COUNT(*) >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT a.u, a.v FROM e${r - 1} a
         |  JOIN n${r - 1} x ON a.u = x.u
         |  JOIN n${r - 1} y ON a.v = y.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH marked AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sess AS (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
      |    ts_us
      |  FROM marked),
      |iv AS (
      |  SELECT user_id, session_id, MIN(ts_us) AS st, MAX(ts_us) AS en
      |  FROM sess GROUP BY 1, 2),
      |pairs AS MATERIALIZED (
      |  SELECT a.user_id AS ua, b.user_id AS ub
      |  FROM iv a JOIN iv b
      |    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e0 AS MATERIALIZED (
      |  SELECT ua AS u, ub AS v FROM pairs
      |  UNION ALL
      |  SELECT ub AS u, ua AS v FROM pairs),
      |$roundCtes
      |SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
      |FROM e$rounds GROUP BY u ORDER BY node""".stripMargin
  }

  val q203AssortativitySql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sess AS (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
      |    ts_us
      |  FROM marked),
      |iv AS (
      |  SELECT user_id, session_id, MIN(ts_us) AS st, MAX(ts_us) AS en
      |  FROM sess GROUP BY 1, 2),
      |edges AS (
      |  SELECT a.user_id AS ua, b.user_id AS ub
      |  FROM iv a JOIN iv b
      |    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
      |  GROUP BY 1, 2),
      |deg AS (
      |  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT ua AS u FROM edges UNION ALL SELECT ub AS u FROM edges)
      |  GROUP BY 1),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
      |    CAST(SUM(da.deg + db.deg) AS BIGINT) AS sx,
      |    CAST(SUM(da.deg * da.deg + db.deg * db.deg) AS BIGINT) AS sxx,
      |    CAST(SUM(2 * da.deg * db.deg) AS BIGINT) AS sxy
      |  FROM edges
      |    JOIN deg da ON da.u = edges.ua
      |    JOIN deg db ON db.u = edges.ub)
      |SELECT n_nodes, n_edges,
      |  CASE WHEN 2 * n_edges * sxx - sx * sx <> 0
      |       THEN CAST(2 * n_edges * sxy - sx * sx AS DOUBLE)
      |            / (2 * n_edges * sxx - sx * sx) END AS assortativity
      |FROM s CROSS JOIN nn""".stripMargin
}

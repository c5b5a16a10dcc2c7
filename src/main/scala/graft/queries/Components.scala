package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge frame — the arbitration
  * step of duplicate clustering (q45) factored out so both the common-case
  * and the adversarial-graph algorithm share one output contract:
  * input = two numeric columns (an undirected edge per row, either or both
  * directions, self-loops ignored); output = (doc_id, rep) with `rep` the
  * component's minimum node id, one row per node that appears in an edge.
  * Isolated nodes are the caller's concern (q45 left-joins the corpus).
  *
  * Two algorithms:
  *  - [[ccPropagate]]: min-label propagation, one shuffle join + aggregate
  *    per round, O(component diameter) rounds. The right choice for
  *    near-dup graphs, whose components are shallow near-cliques of mutual
  *    duplicates (diameter 2-3).
  *  - [[ccStar]]: alternating large-star/small-star (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC'14),
  *    O(log n) rounds regardless of diameter. The right choice when
  *    components can be adversarially deep chains (e.g. edit-chain
  *    duplicates), where propagation would need diameter rounds.
  *
  * Both truncate lineage per round with eager `localCheckpoint` (20+ rounds
  * must not compound the plan) and fail loudly on non-convergence instead
  * of returning silently-wrong labels.
  */
object Components {

  /** BFS depths from a source node — the frontier-expansion iterative
    * idiom (distinct from label propagation: it terminates the moment the
    * frontier drains, touches only the REACHED part of the graph, and
    * yields hop distances rather than component labels). Per round: one
    * join frontier×edges + one anti-join against the visited set, lineage
    * truncated per round. Like ccPropagate, the per-round emptiness test
    * is the standard driver-side fixpoint check — bounded by `maxDepth`,
    * loud on overrun.
    *
    * Input contract matches ccPropagate: two numeric columns, either or
    * both edge directions (symmetrized internally — see the round-4
    * gotcha), self-loops ignored. Output: (node, dist) for every node
    * reachable from `source` within `maxDepth` hops, source included at 0.
    */
  def bfsDepths(edges0: DataFrame, source: Long, maxDepth: Int = 20): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    val e = edges0.toDF("u", "v").filter($"u" =!= $"v")
    val edges = e
      .select(explode(array(struct($"u", $"v"),
        struct($"v".as("u"), $"u".as("v")))).as("x"))
      .select($"x.u".as("u"), $"x.v".as("v"))
      .distinct().localCheckpoint(true)
    var visited = Seq((source, 0L)).toDF("node", "dist").localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var drained = false
    while (!drained && depth < maxDepth) {
      depth += 1
      val next = frontier.join(edges, frontier("node") === edges("u"))
        .select($"v".as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) drained = true
      else {
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
      }
    }
    // reaching maxDepth with a live frontier is not an error: BFS
    // legitimately truncates at its depth budget
    visited
  }

  /** Min-label propagation to fixpoint. ONE Spark job per round: the
    * round's labels are materialized by `localCheckpoint(eager = true)`,
    * and the convergence counter is a LongAccumulator filled by that same
    * job's map — no second count() pass over the labels. Task retries can
    * only inflate the counter, never zero it, and the loop only tests
    * zero/non-zero, so at-least-once accumulator semantics are sound here.
    *
    * The symmetrized edge frame is checkpointed HERE, inside the loop's
    * setup, because `sym` is re-joined once per round: an expensive
    * un-materialized edge lineage (e.g. a blocking self-join) would
    * otherwise be re-executed O(diameter) times — callers must not have
    * to remember to pre-checkpoint (q218 round-7 regression).
    */
  def ccPropagate(edges0: DataFrame, maxRounds: Int = 20): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    val directed = edges0.toDF("u", "v")
      .select($"u".cast("long").as("u"), $"v".cast("long").as("v"))
      .filter($"u" =!= $"v")
    // checkpoint AFTER a repartition on the round-join key: LogicalRDD
    // preserves the child's output partitioning, so every round's
    // sym-side exchange is elided — only the (vertex-sized) label frame
    // moves per round, the edge mass stays where it landed. Symmetrize
    // via a per-row explode, NOT unionAll of two selects: a union
    // evaluates the (possibly expensive) input lineage once per branch,
    // the explode exactly once (ComponentsSpec pins the 1x).
    val sym = directed
      .select(explode(array(struct($"u", $"v"),
        struct($"v".as("u"), $"u".as("v")))).as("e"))
      .select($"e.u".as("u"), $"e.v".as("v"))
      .repartition($"v")
      .localCheckpoint(true)
    var labels = sym.select($"u".as("doc_id")).distinct()
      .withColumn("rep", $"doc_id").localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val acc = s.sparkContext.longAccumulator(s"cc_propagate_changed_r$rounds")
      val nbrMin = sym
        .join(labels.select($"doc_id".as("v"), $"rep".as("vrep")), "v")
        .groupBy($"u".as("doc_id")).agg(min($"vrep").as("nbr_rep"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select($"doc_id", $"rep", $"nbr_rep")
        .as[(Long, Long, Option[Long])]
        .map { case (id, rep, nbr) =>
          val nr = nbr.fold(rep)(math.min(rep, _))
          if (nr < rep) acc.add(1L)
          (id, nr)
        }
        .toDF("doc_id", "rep").localCheckpoint(true)
      changed = acc.value
      labels = next
      rounds += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"ccPropagate: label propagation did not converge in $rounds rounds " +
        "(component diameter exceeds the round budget) — use ccStar for " +
        "deep-chain graphs")
    labels
  }

  /** Alternating large-star/small-star. Each round:
    *  - large-star: every node connects its LARGER neighbors to the
    *    minimum of its closed neighborhood (min aggregation + join back —
    *    no neighborhood collection, so hub nodes cannot blow up a task);
    *  - small-star: every edge directed larger→smaller, each node rewires
    *    its smaller neighbors (and itself) to their minimum.
    * The edge set contracts toward a set of stars rooted at each
    * component's minimum; converged when a round leaves the edge set
    * unchanged. Round count is O(log n) even on chain graphs, which is
    * exactly where ccPropagate's O(diameter) loses.
    */
  def ccStar(edges0: DataFrame, maxRounds: Int = 30): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    val input = edges0.toDF("a", "b")
      .select($"a".cast("long").as("a"), $"b".cast("long").as("b"))
      .filter($"a" =!= $"b")
    val nodes = input
      .select(explode(array($"a", $"b")).as("doc_id")).distinct()
      .localCheckpoint(true)
    var e = input
      .select(greatest($"a", $"b").as("hi"), least($"a", $"b").as("lo"))
      .distinct().localCheckpoint(true)
    var rounds = 0
    var converged = e.isEmpty
    while (!converged && rounds < maxRounds) {
      // large-star over the symmetrized edge set
      val sym = e.select($"hi".as("u"), $"lo".as("v"))
        .unionAll(e.select($"lo".as("u"), $"hi".as("v")))
      val lMins = sym.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"u", $"mv").as("m"))
      val e1 = sym.join(lMins, "u").filter($"v" > $"u")
        .select($"v".as("hi"), $"m".as("lo"))
        .distinct()
      // small-star over larger→smaller directed edges (hi, lo)
      val sMins = e1.groupBy($"hi").agg(min($"lo").as("m"))
      val e2 = e1.join(sMins, "hi")
        .select($"lo".as("n"), $"m")
        .unionAll(sMins.select($"hi".as("n"), $"m"))
        .filter($"n" =!= $"m")
        .select(greatest($"n", $"m").as("hi"), least($"n", $"m").as("lo"))
        .distinct().localCheckpoint(true)
      converged =
        e2.count() == e.count() && e2.except(e).isEmpty
      e = e2
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ccStar: did not converge in $rounds rounds")
    // converged edge set is a union of stars: hi → its component's min.
    // groupBy-min is a belt-and-braces guard for the (impossible at a
    // true fixpoint) case of a node with two outgoing star edges.
    val labels = e.groupBy($"hi".as("doc_id")).agg(min($"lo").as("rep"))
    nodes.join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"rep", $"doc_id").as("rep"))
  }
}

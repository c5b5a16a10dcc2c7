package graft.queries

import graft.SparkSpec

/** Both connected-components algorithms must agree — with each other and
  * with ground truth — including on graphs min-label propagation is worst
  * at (deep chains) and graphs large-star/small-star is worst at (stars
  * already rooted at the max node).
  */
class ComponentsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def edgeFrame(edges: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("u", "v")
  }

  test("chain deeper than 3 — both algorithms label every node with the chain min") {
    // 0-1-2-...-10: diameter 10. Propagation needs ~10 rounds (within its
    // 20-round budget); ccStar needs O(log 10).
    val chain = edgeFrame((0L until 10L).map(i => (i, i + 1)))
    val expected = (0L to 10L).map(_ -> 0L).toMap
    assert(labelsOf(Components.ccPropagate(chain)) == expected)
    assert(labelsOf(Components.ccStar(chain)) == expected)
  }

  test("multiple components, mixed shapes, either edge direction") {
    // component A: chain 5-4-3-2 given large→small; component B: triangle
    // 10,11,12; component C: isolated edge 20-21; self-loop ignored
    val edges = edgeFrame(Seq(
      (5L, 4L), (4L, 3L), (3L, 2L),
      (10L, 11L), (12L, 10L), (11L, 12L),
      (21L, 20L), (7L, 7L)))
    val expected = Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(labelsOf(Components.ccPropagate(edges)) == expected)
    assert(labelsOf(Components.ccStar(edges)) == expected)
  }

  test("star already rooted at its min is a fixpoint; rooted at its max still converges") {
    val atMin = edgeFrame(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    val atMax = edgeFrame(Seq((4L, 1L), (4L, 2L), (4L, 3L)))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    assert(labelsOf(Components.ccStar(atMin)) == expected)
    assert(labelsOf(Components.ccStar(atMax)) == expected)
    assert(labelsOf(Components.ccPropagate(atMax)) == expected)
  }

  test("empty edge set yields empty labels") {
    val empty = edgeFrame(Seq.empty)
    assert(Components.ccPropagate(empty).count() == 0)
    assert(Components.ccStar(empty).count() == 0)
  }

  test("bfsDepths: exact hop distances on a chain, one-direction input, unreached excluded") {
    // chain 0-1-...-10 given in ONE direction plus a disconnected 100-101
    val edges = edgeFrame((0L until 10L).map(i => (i, i + 1)) :+ (100L, 101L))
    val d = labelsOf(Components.bfsDepths(edges, source = 0L))
    assert(d == (0L to 10L).map(i => i -> i).toMap) // exact depths, no 100/101
  }

  test("bfsDepths: cycles terminate and the depth budget truncates") {
    val triangle = edgeFrame(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(labelsOf(Components.bfsDepths(triangle, source = 1L)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    val chain = edgeFrame((0L until 10L).map(i => (i, i + 1)))
    val truncated = labelsOf(Components.bfsDepths(chain, source = 0L, maxDepth = 3))
    assert(truncated == (0L to 3L).map(i => i -> i).toMap)
  }

  test("ccStar matches ccPropagate on the real near-dup pair graph") {
    val s = spark
    import s.implicits._
    val pairs = Dedup.q40NgramJaccard(s, dir).select($"d1", $"d2")
    assert(labelsOf(Components.ccStar(pairs)) == labelsOf(Components.ccPropagate(pairs)))
  }

  test("q300: no near-dup pair straddles a split boundary (the leakage guarantee)") {
    val s = spark
    import s.implicits._
    val asg = Dedup.q300LeakageSafeSplit(s, dir)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.q40NgramJaccard(s, dir)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs)
      assert(asg(a) == asg(b), s"pair ($a, $b) straddles ${asg(a)}/${asg(b)}")
    // and the split is genuinely three-way on this corpus
    assert(asg.values.toSet == Set("train", "val", "test"))
  }

  test("ccPropagate executes its input lineage exactly once, however many rounds run") {
    // the round-7 q218 regression class: an EXPENSIVE un-materialized
    // edge pipeline fed to ccPropagate was re-executed once per
    // propagation round. The fix checkpoints the symmetrized edges
    // inside ccPropagate — pinned here by counting input evaluations
    // with an accumulator on a deep chain (many rounds)
    val s = spark
    import s.implicits._
    val n = 12L
    val acc = s.sparkContext.longAccumulator("cc_input_evals")
    val edges = (0L until n).map(i => (i, i + 1)).toDF("u", "v")
      .as[(Long, Long)]
      .map { e => acc.add(1L); e }
      .toDF("u", "v")
    val labels = labelsOf(Components.ccPropagate(edges))
    assert(labels == (0L to n).map(_ -> 0L).toMap) // correctness unchanged
    // every input row evaluated exactly once — a per-round re-execution
    // would make this a multiple of the row count
    assert(acc.value == n, s"input lineage ran ${acc.value / n.toDouble}x")
  }
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q103 PageRank + q104-q106 language-model lanes: invariant laws the
  * oracle hash cannot state (mass conservation, monotonicity), plus
  * hand-built micro-corpora where the expected answer is computable by
  * hand.
  */
class GraphsLangModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q103: ranks are a probability distribution (sum≈1, all positive)") {
    val rows = Graphs.q103PageRank(spark, sf).collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(_.getDouble(rows.head.fieldIndex("rank")))
    assert(ranks.forall(r => r > 0 && !r.isNaN))
    // with every node having outgoing mass absorbed by teleport+damping,
    // total rank stays 1 up to dangling-node leakage (<= damping mass)
    val total = ranks.sum
    assert(total > 0.5 && total <= 1.000001, s"total rank $total")
  }

  test("q103: a 2-node cycle converges to uniform ranks") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-pr").toString
    // user 1 alternates a->b->a->b: edge a->b and b->a, weight symmetric
    Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"), (1L, 5L, 5L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val m = Graphs.q103PageRank(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("rank"))).toMap
    assert(math.abs(m("a") - 0.5) < 1e-12 && math.abs(m("b") - 0.5) < 1e-12)
  }

  test("q104: repetitive doc scores higher avg logprob than a one-off doc") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lm").toString
    // corpus dominated by "a b" transitions; doc 2 has never-repeated ones
    (Seq((0L, "a b a b a b a b"), (1L, "a b a b a b"), (2L, "q r s t u v"))
      ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = LangModel.q104BigramLm(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getFloat(r.fieldIndex("avg_logprob"))).toMap
    assert(m(0L) > m(2L) && m(1L) > m(2L))
    val n = LangModel.q104BigramLm(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_bigrams"))).toMap
    assert(n(0L) == 7L && n(1L) == 5L && n(2L) == 5L)
  }

  test("q105: target-language docs get higher importance than off-target") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dsir").toString
    // en docs share a vocabulary; the xx doc uses disjoint tokens, so its
    // buckets are raw-only and must score below every en doc
    (Seq(
      (0L, "en", "alpha beta gamma alpha beta"),
      (1L, "en", "alpha beta beta gamma gamma"),
      (2L, "xx", "zork quux blarg zork quux")
    )).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = LangModel.q105DsirWeights(spark, tmp).collect()
    val m = rows.map(r => r.getLong(0) -> r.getFloat(r.fieldIndex("log_importance"))).toMap
    assert(m(0L) > m(2L) && m(1L) > m(2L))
    val nt = rows.map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_tokens"))).toMap
    assert(nt == Map(0L -> 5L, 1L -> 5L, 2L -> 5L))
  }

  test("q113: two disjoint triangles converge to their min-label communities") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lpa").toString
    // u1 walks cycle a->b->c twice, u2 walks x->y->z twice: two
    // equal-weight triangles; 3 synchronous rounds collapse each onto
    // its lexicographically smallest member (hand-traced: r1 mixes,
    // r2 floods "a"/"x", r3 stabilizes)
    val walk1 = Seq("a", "b", "c", "a", "b", "c", "a")
    val walk2 = Seq("x", "y", "z", "x", "y", "z", "x")
    val rows =
      walk1.zipWithIndex.map { case (t, i) => (1L, i.toLong, i.toLong, t) } ++
      walk2.zipWithIndex.map { case (t, i) => (2L, i.toLong, (100 + i).toLong, t) }
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Graphs.q113LabelProp(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"))
  }

  test("q114: hand-built day grid yields the right DAU and 7-day WAU") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wau").toString
    def day(d: Int, u: Long, id: Long) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00").getTime * 1000000L,
        u, "view", 0.0, "{}")
    // day 1: users 1,2 · day 5: user 2 (twice) · day 9: user 3
    Seq(day(1, 1L, 1), day(1, 2L, 2), day(5, 2L, 3), day(5, 2L, 4), day(9, 3L, 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.q114RollingActive(spark, tmp).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 2L),   // users 1,2
      ("2024-01-05", 1L, 2L),   // dau {2}; wau covers day 1 too: {1,2}
      ("2024-01-09", 1L, 2L)))  // dau {3}; wau covers day 5: {2,3}
  }

  test("q120: AND retrieval keeps only all-terms docs, ranked by summed tf") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bool").toString
    Seq(
      (1L, "table row value"),             // all three, tf_sum 3
      (2L, "table table row value value"), // all three, tf_sum 5
      (3L, "table row row row"),           // missing 'value'
      (4L, "zz zz")                        // none
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = LangModel.q120BooleanRetrieval(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 5L), (1L, 3L)))
  }

  test("q106: df/tf accounting and head postings on a micro-corpus") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-inv").toString
    (Seq((3L, "x y x"), (1L, "x z"), (2L, "y"))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = LangModel.q106InvertedIndex(spark, tmp).collect()
    val byW = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(r.fieldIndex("head_postings")))).toMap
    assert(byW("x") == ((2L, 3L, "1,3")))  // df=2 docs, tf=3 total, postings sorted
    assert(byW("y") == ((2L, 2L, "2,3")))
    assert(byW("z") == ((1L, 1L, "1")))
    // ordered by df desc then term asc
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
  }

  test("q133: new-type accounting on a micro-corpus with a tiny bucket width") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-heaps").toString
    // bucket width 2: bucket 0 = docs {0,1}, bucket 1 = docs {2}
    // bucket 0 introduces {a,b,c} (5 tokens), bucket 1 repeats a,b and
    // introduces d (3 tokens) -> new_types 3 then 1
    (Seq((0L, "a b a"), (1L, "b c"), (2L, "a b d"))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = LangModel.q133VocabGrowth(spark, tmp, bucketDocs = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got == List((0L, 5L, 3L, 5L, 3L), (1L, 3L, 1L, 8L, 4L)))
  }

  test("q134: slope/intercept match the driver-computed least squares") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-zipf").toString
    // frequencies 12,6,4,3 on ranks 1..4: exactly c = 12/r, so
    // ln c = ln 12 - 1·ln r and the least-squares fit recovers the
    // perfect line (slope -1, intercept ln 12) up to float
    val corpus = Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++ Seq.fill(4)("w3") ++ Seq.fill(3)("w4")
    Seq((0L, corpus.mkString(" "))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = LangModel.q134ZipfSlope(spark, tmp).collect().head
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = Seq(12, 6, 4, 3).map(c => math.log(c.toDouble))
    val (n, sx, sy) = (4.0, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getFloat(1) - slope) < 1e-6, s"slope ${r.getFloat(1)} vs $slope")
    assert(math.abs(r.getFloat(2) - intercept) < 1e-6)
    assert(math.abs(slope + 1.0) < 1e-12 && math.abs(intercept - math.log(12.0)) < 1e-12)
  }

  test("q215: bounded-round peel reaches the fixpoint and equals a driver k-core") {
    // sf0.001's repeat-co-presence graph is empty; the gate scale is
    // where the peel carves (33 of 97 candidates survive)
    val dir = "/root/testdata/sf0.01"
    val got = Graphs.q215Kcore(spark, dir, k = 2, rounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(_ >= 2L))
    // fixpoint inside the budget: one more round changes nothing
    val more = Graphs.q215Kcore(spark, dir, k = 2, rounds = 11).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == more)
    // driver recompute: peel to convergence on the collected edge list
    val pairs = Timeseries.q198IntervalJoin(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_overlaps") >= 2)
      .select("user_a", "user_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    var nodes = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = nodes.filter(u => (adj(u) & nodes).size < 2)
      changed = drop.nonEmpty
      nodes = nodes -- drop
    }
    val expect = nodes.map(u => u -> (adj(u) & nodes).size.toLong).toMap
    assert(got == expect)
  }

  test("q203: assortativity is a valid correlation and matches a driver recompute") {
    val dir = "/root/testdata/sf0.001"
    val r = Graphs.q203Assortativity(spark, dir).collect().head
    val nNodes = r.getAs[Long]("n_nodes")
    val nEdges = r.getAs[Long]("n_edges")
    assert(nNodes > 0 && nEdges > 0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12)
    // recompute Newman's r from the raw edge list on the driver
    val edges = Timeseries.q198IntervalJoin(spark, dir)
      .select("user_a", "user_b").collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(nNodes == deg.size && nEdges == edges.length)
    val n = 2L * edges.length
    val sx = edges.map { case (u, v) => deg(u) + deg(v) }.sum
    val sxx = edges.map { case (u, v) => deg(u) * deg(u) + deg(v) * deg(v) }.sum
    val sxy = edges.map { case (u, v) => 2L * deg(u) * deg(v) }.sum
    val expect = (n * sxy - sx * sx).toDouble / (n * sxx - sx * sx)
    assert(a == expect, s"got $a expected $expect")
  }

  test("q245: hand-computed nucleus and entropy on a micro corpus; " +
    "real-data bounds hold") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-nucleus").toString
    // "a b a b a c": context a → {b:2, c:1}; context b → {a:2}
    Seq((1L, "a b a b a c", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val micro = LangModel.q245Nucleus(spark, tmp).collect()
      .map(r => r.getAs[String]("w1") ->
        (r.getAs[Long]("n_ctx"), r.getAs[Long]("n_succ"),
         r.getAs[Long]("nucleus_size"), r.getAs[Float]("entropy"))).toMap
    val a = micro("a")
    assert(a._1 == 3L && a._2 == 2L)
    // cum_before(b)=0 < 2.7, cum_before(c)=2 → 20 < 27: both in the nucleus
    assert(a._3 == 2L)
    val hA = -(2.0 / 3 * math.log(2.0 / 3)) - (1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(a._4 - hA) < 1e-6)
    val b = micro("b")
    assert(b == ((2L, 1L, 1L, -0.0f)) || b == ((2L, 1L, 1L, 0.0f)))

    val rows = LangModel.q245Nucleus(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("nucleus_size") >= 1 &&
        r.getAs[Long]("nucleus_size") <= r.getAs[Long]("n_succ"))
      assert(r.getAs[Float]("entropy") >= -0.0f)
      // entropy ≤ ln(n_succ) (uniform maximizes)
      assert(r.getAs[Float]("entropy") <=
        math.log(r.getAs[Long]("n_succ").toDouble) + 1e-6)
    }
  }

  test("q238: modularity trajectory — singleton start, coarsening rounds, " +
    "round-0 Q matches a local recompute from the raw graph") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Graphs.q238Modularity(spark, dir).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(0L, 1L, 2L, 3L))
    // community counts can only coarsen or hold under synchronous LP? No —
    // LP can oscillate; what IS invariant: round 0 is the singleton
    // partition and every Q is a valid modularity value
    rows.foreach { r =>
      val q = r.getAs[Float]("modularity")
      assert(q >= -0.5f && q <= 1.0f)
      assert(r.getAs[Long]("n_communities") >= 1)
    }
    // independent round-0 recompute: singleton partition over the
    // symmetrized transition graph built directly from events
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val es = ev.withColumn("src",
        org.apache.spark.sql.functions.lag($"event_type", 1).over(byUser))
      .filter($"src".isNotNull)
      .select($"src", $"event_type".as("dst"))
      .as[(String, String)].collect()
    val sym = scala.collection.mutable.Map.empty[(String, String), Long]
    es.foreach { case (a, b) =>
      sym((a, b)) = sym.getOrElse((a, b), 0L) + 1
      sym((b, a)) = sym.getOrElse((b, a), 0L) + 1
    }
    val twom = sym.values.sum.toDouble
    val nodes = sym.keys.map(_._1).toSeq.distinct.sorted
    val k = nodes.map(n => n -> sym.collect { case ((a, _), w) if a == n => w }.sum).toMap
    var q0 = 0.0
    nodes.foreach { n =>
      q0 += sym.getOrElse((n, n), 0L) / twom - (k(n) / twom) * (k(n) / twom)
    }
    val r0 = rows.head
    assert(r0.getAs[Long]("n_communities") >= nodes.length) // isolated nodes may add
    assert(math.abs(r0.getAs[Float]("modularity") - q0) < 1e-6,
      s"round-0 Q ${r0.getAs[Float]("modularity")} vs local $q0")
  }
}

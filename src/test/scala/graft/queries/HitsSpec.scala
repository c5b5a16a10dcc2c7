package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q260 HITS: an independent plain-Scala reference of the quantized
  * a-then-h iteration on a hand-built transition graph, plus the
  * normalization laws on the test corpus (scores in [0, 10⁶], the
  * argmax register pinned at exactly 10⁶, floats are exact quotients).
  */
class HitsSpec extends SparkSpec {

  private val Q = 1000000L

  private def refHits(edges: Map[(String, String), Long], nodes: Seq[String],
      iters: Int): (Map[String, Long], Map[String, Long]) = {
    var h = nodes.map(_ -> Q).toMap
    var a = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val as = nodes.map(v => v -> edges.collect {
        case ((u, vv), w) if vv == v => w * h(u) }.sum).toMap
      val amax = as.values.max
      a = nodes.map(v => v -> (if (amax == 0) 0L else as(v) * Q / amax)).toMap
      val hs = nodes.map(u => u -> edges.collect {
        case ((uu, v), w) if uu == u => w * a(v) }.sum).toMap
      val hmax = hs.values.max
      h = nodes.map(u => u -> (if (hmax == 0) 0L else hs(u) * Q / hmax)).toMap
    }
    (a, h)
  }

  test("matches the plain-Scala reference on a hand-built star-plus-chain graph") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-hits").toString
    // u1: h->a1, u2: h->a2, u3: h->a1, u4: a1->a2
    // edges: (h,a1)=2, (h,a2)=1, (a1,a2)=1
    Seq(
      (1L, 1L, 1L, "h"), (1L, 2L, 2L, "a1"),
      (2L, 3L, 3L, "h"), (2L, 4L, 4L, "a2"),
      (3L, 5L, 5L, "h"), (3L, 6L, 6L, "a1"),
      (4L, 7L, 7L, "a1"), (4L, 8L, 8L, "a2")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val (ra, rh) = refHits(
      Map(("h", "a1") -> 2L, ("h", "a2") -> 1L, ("a1", "a2") -> 1L),
      Seq("h", "a1", "a2"), iters = 3)
    val got = Graphs.q260Hits(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "h" -> ((ra("h"), rh("h"))),
      "a1" -> ((ra("a1"), rh("a1"))),
      "a2" -> ((ra("a2"), rh("a2")))))
    // structure: h is the best hub; a1 out-authorities a2's single
    // weaker in-edge profile? — assert the hand-reasoned ordering
    assert(rh("h") == Q)           // h points at both authorities
    assert(ra("a1") > ra("a2") || ra("a1") == Q || ra("a2") == Q)
    assert(ra("h") == 0L)          // nothing points at h
  }

  test("normalization expression is overflow-safe past the int64 numerator boundary") {
    // s is bounded by totalEdgeWeight·10⁶, so the ·10⁶ normalization
    // numerator leaves int64 once total edge weight exceeds ~9.2·10⁶
    // transitions. The query computes it in DECIMAL(38,0); this law
    // pins the expression to a BigInt floor reference on values
    // straddling the boundary (the old `s * 10⁶ div mx` int64 form
    // wraps negative on every row here past the third).
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val mx = 9300000000000L // ~9.3e12: max sum at ~9.3e6 transitions
    val ss = Seq(0L, 1L, 9223372036854L, 9223372036855L, // boundary s·10⁶ ≈ 2⁶³
      4650000000000L, 9299999999999L, mx)
    val got = ss.toDF("s")
      .select(expr(s"(cast(s as decimal(38,0)) * $Q) div $mx").cast("long").as("q"))
      .collect().map(_.getLong(0))
    val want = ss.map(s => (BigInt(s) * Q / mx).toLong)
    assert(got.toSeq == want)
    assert(got.last == Q && got.forall(q => q >= 0L && q <= Q))
  }

  test("normalization laws on the test corpus: scores in [0, 10^6], argmax pinned, floats exact") {
    val rows = Graphs.q260Hits(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val (aqs, hqs) = (rows.map(_.getLong(1)), rows.map(_.getLong(2)))
    assert(aqs.forall(q => q >= 0L && q <= Q) && hqs.forall(q => q >= 0L && q <= Q))
    assert(aqs.max == Q && hqs.max == Q)
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(1).toDouble / Q)
      assert(r.getDouble(4) == r.getLong(2).toDouble / Q)
    }
  }
}

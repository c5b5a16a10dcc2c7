package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The bounded-accuracy half of q102's contract: at accuracy A,
  * `percentile_approx` guarantees rank error ≤ n/A (the published
  * Greenwald–Khanna bound Spark documents). The full-accuracy
  * registered form is graded value-exactly by the DuckDB oracle; this
  * spec grades the SKETCHING path — small accuracy on the same data —
  * by measuring the actual rank of each returned value.
  */
class QuantileSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("bounded-accuracy sketch answers are within the documented rank-error bound") {
    import spark.implicits._
    val accuracy = 100 // rank error ≤ n/100 = 1% of each group
    val events = Tables.load(spark, dir, "events").select($"event_type", $"value")
    val approx = events.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        percentile_approx($"value", lit(0.5), lit(accuracy)).as("a50"),
        percentile_approx($"value", lit(0.9), lit(accuracy)).as("a90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // true rank of each sketch answer within its group
    val ranks = events.as("e").join(
        approx.toSeq.toDF("event_type", "stats").select($"event_type",
          $"stats._2".as("a50"), $"stats._3".as("a90")), "event_type")
      .groupBy($"event_type")
      .agg(sum(when($"value" <= $"a50", 1L).otherwise(0L)).as("r50"),
           sum(when($"value" <= $"a90", 1L).otherwise(0L)).as("r90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    approx.foreach { case (et, (n, _, _)) =>
      val (r50, r90) = ranks(et)
      val eps = n.toDouble / accuracy
      assert(math.abs(r50 - 0.5 * n) <= eps + 1,
        s"$et: p50 rank $r50 outside ${0.5 * n} ± $eps")
      assert(math.abs(r90 - 0.9 * n) <= eps + 1,
        s"$et: p90 rank $r90 outside ${0.9 * n} ± $eps")
    }
  }

  test("full-accuracy sketch equals the exact discrete quantile (the oracle's premise)") {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events").select($"event_type", $"value")
    val full = events.groupBy($"event_type")
      .agg(percentile_approx($"value", lit(0.9), lit(1000000)).as("p"))
    val exact = events.groupBy($"event_type")
      .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("x"))
    val joined = full.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"${r.getString(0)}: sketch ${r.getDouble(1)} != exact ${r.getDouble(2)}"))
  }

  test("q242: HLL registers are mergeable — register-wise max of disjoint " +
    "halves equals the whole-corpus sketch; error inside 3 sigma") {
    import spark.implicits._
    val r = Analytic.q242HllDistinct(spark, dir).collect().head
    val exact = r.getAs[Long]("exact_distinct")
    val est = r.getAs[Float]("estimate").toDouble
    assert(exact > 0)
    // 3σ of the published HLL standard error 1.04/√m
    val sigma = 1.04 / math.sqrt(64.0)
    assert(math.abs(est - exact) / exact <= 3 * sigma,
      s"estimate $est vs exact $exact")
    assert(math.abs(r.getAs[Float]("rel_error") - (est - exact) / exact) < 1e-5)

    // mergeability: registers from two disjoint halves, max-merged,
    // must equal the whole-corpus registers — recomputed locally from
    // the same md5-derived integers
    val texts = Tables.load(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("ws"))
      .as[(Long, Seq[String])].collect()
    def registers(docs: Array[(Long, Seq[String])]): Array[Long] = {
      val regs = Array.fill(64)(0L)
      docs.foreach { case (_, ws) =>
        ws.sliding(3).filter(_.size == 3).foreach { tri =>
          val g = tri.mkString(" ")
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
          val hv = java.lang.Long.parseLong(hex, 16)
          val idx = (hv % 64).toInt
          val tail = hv >> 6
          val rho = if (tail == 0L) 55L else 55L - java.lang.Long.toBinaryString(tail).length
          if (rho > regs(idx)) regs(idx) = rho
        }
      }
      regs
    }
    val (h1, h2) = texts.partition(_._1 % 2 == 0)
    val whole = registers(texts)
    val merged = registers(h1).zip(registers(h2)).map { case (a, b) => math.max(a, b) }
    assert(whole.toSeq == merged.toSeq)
    assert(whole.exists(_ > 0))
  }

  test("q247: the union scope IS the whole-corpus q242 sketch; " +
    "per-source exact counts bound the union") {
    val rows = Analytic.q247HllSetops(spark, dir).collect()
      .map(r => r.getAs[String]("scope") ->
        (r.getAs[Float]("estimate"), r.getAs[Long]("exact_distinct"))).toMap
    val union = rows("__union__")
    // register-wise max over per-source registers equals building the
    // sketch over the whole corpus — so the union estimate must equal
    // q242's estimate bit-for-bit
    val q242 = Analytic.q242HllDistinct(spark, dir).collect().head
    assert(union._1 == q242.getAs[Float]("estimate"))
    assert(union._2 == q242.getAs[Long]("exact_distinct"))
    // subadditivity of the exact counts: union ≤ Σ sources (shared
    // shingles collapse), and union ≥ every single source
    val srcs = (rows - "__union__").values.map(_._2)
    assert(union._2 <= srcs.sum)
    assert(srcs.forall(_ <= union._2))
  }
}

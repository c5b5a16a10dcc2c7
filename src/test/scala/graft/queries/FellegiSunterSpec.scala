package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q297 Fellegi–Sunter EM: on a corpus with PLANTED duplicate pairs the
  * unsupervised fit must separate the two latent classes — every
  * field's match agreement rate m ends above its non-match rate u, so
  * the log weights that serving systems threshold on are positive for
  * agreement. Also pins the parameter-space invariants.
  */
class FellegiSunterSpec extends SparkSpec {

  test("EM separates planted duplicates: m > u per field, parameters in range") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-fs").toString
    // 40 even/odd planted pairs (2k, 2k+1): identical segment and
    // balance -> they agree on every comparison field; 120 fillers with
    // spread balances/segments agree only by chance. One nation so
    // blocking keeps all cross pairs.
    val segs = Seq("BUILDING", "MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD")
    val planted = (0 until 80).map { i =>
      val k = i / 2
      (i.toLong, s"Customer#$i", 7, 1000.0 + k * 137.5, segs(k % segs.length))
    }
    val filler = (80 until 200).map { i =>
      (i.toLong, s"Customer#$i", 7, (i * 97 % 9000) + i * 0.01, segs(i % segs.length))
    }
    (planted ++ filler)
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val r = Entity.q297FellegiSunter(spark, tmp).collect().head
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    val p = d("p")
    assert(p > 0.0 && p < 1.0, s"p=$p")
    for (f <- Seq("mkt", "band", "cents", "digit")) {
      val (m, u) = (d(s"m_$f"), d(s"u_$f"))
      assert(m >= 0.0 && m <= 1.0 && u >= 0.0 && u <= 1.0, s"$f: m=$m u=$u")
      assert(m > u, s"field $f not separated: m=$m u=$u")
      assert(r.getFloat(r.fieldIndex(s"w_$f")) > 0f, s"w_$f")
    }
    // the planted pairs dominate the match class: every planted pair
    // agrees on all four fields, so the fitted match-class agreement
    // rates should be near-certain for the exact-valued fields
    assert(d("m_cents") > 0.8, s"m_cents=${d("m_cents")}")
    assert(r.getLong(r.fieldIndex("n_pairs")) == 100L * 100L)
  }
}

package graft.queries

import graft.SparkSpec

/** Cross-query coherence for the privacy audits: q220's finest ladder
  * level states the SAME facts as q219's class list, and both respect
  * the population (nobody is counted twice, nobody vanishes).
  */
class PrivacySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q220's $1000 level agrees with q219's class list; exposure sums match") {
    import spark.implicits._
    val classes = Validation.q219KAnonymity(spark, dir).collect()
    val ladder = Validation.q220GeneralizationLadder(spark, dir).collect()
      .map(r => r.getInt(r.fieldIndex("level")) ->
        (r.getAs[Long]("n_risky"), r.getAs[Long]("n_exposed_records"))).toMap
    val (nRisky, nExposed) = ladder(1000)
    assert(nRisky == classes.length.toLong)
    assert(nExposed == classes.map(_.getAs[Long]("class_k")).sum)
    // member lists partition the exposed population: no key twice
    val keys = classes.flatMap(_.getAs[String]("member_keys").split(","))
    assert(keys.length == keys.distinct.length)
    assert(keys.length.toLong == nExposed)
  }

  test("coarser levels never have more classes, and exposure is bounded by population") {
    import spark.implicits._
    val ladder = Validation.q220GeneralizationLadder(spark, dir).collect()
      .sortBy(_.getInt(0))
    val nCustomers = graft.sources.Tables.load(spark, dir, "customer").count()
    val classCounts = ladder.map(_.getAs[Long]("n_classes"))
    assert(classCounts.zip(classCounts.tail).forall { case (fine, coarse) => coarse <= fine })
    assert(ladder.forall(_.getAs[Long]("n_exposed_records") <= nCustomers))
  }

  test("q232 l-diversity: homogeneous classes are flagged even when k-anonymous") {
    import java.nio.file.Files
    import spark.implicits._
    // one class of 10 members all sharing ONE segment (k-safe at k=5,
    // l-violating at l=3) and one class of 3 members with 3 segments
    // (l-safe despite being small)
    val rows =
      (1 to 10).map(i => (i.toLong, 1, "AUTOMOBILE", 500.0)) ++
      Seq((11L, 2, "BUILDING", 500.0), (12L, 2, "MACHINERY", 500.0),
        (13L, 2, "FURNITURE", 500.0))
    val tmp = Files.createTempDirectory("graft-ldiv").toString
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = Validation.q232LDiversity(spark, tmp).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_l_violations"), r.getAs[Long]("min_l"),
        r.getAs[Long]("n_exposed_records"))).toMap
    // every ladder level: 2 classes, only the homogeneous one violates,
    // min_l = 1, 10 exposed records — the k-anonymity audit (q219, k=5)
    // sees the same class as SAFE, which is the attack l-diversity closes
    assert(got.values.forall(_ == ((2L, 1L, 1L, 10L))))
    val k5 = Validation.q219KAnonymity(spark, tmp).collect()
    assert(!k5.exists(r => r.getAs[Int]("nation") == 1))
  }

  test("q292 t-closeness: hand-computed ordered EMD; the skewed-but-large class " +
    "is flagged while the representative one passes") {
    import java.nio.file.Files
    import spark.implicits._
    // class A (nation 1): 10 members ALL in the top $2000 band — k-safe
    // at k=5, yet its balance distribution sits far from the global one
    // (the skewness attack t-closeness exists to close). class B
    // (nation 2): 30 members spread 15/10/5 across bands 0/1/2.
    // Global: 40 records, bands (15, 10, 15), m = 3.
    //   EMD(A) = (|0-.375| + |0-.375-.25| + 0) / (3-1) = 0.5
    //   EMD(B) = (.125 + .2083 + 0) / 2 = 1/6
    val rows =
      (1 to 10).map(i => (i.toLong, 1, "AUTOMOBILE", 4500.0)) ++
      (11 to 25).map(i => (i.toLong, 2, "AUTOMOBILE", 500.0)) ++
      (26 to 35).map(i => (i.toLong, 2, "AUTOMOBILE", 2500.0)) ++
      (36 to 40).map(i => (i.toLong, 2, "AUTOMOBILE", 4500.0))
    val tmp = Files.createTempDirectory("graft-tclose").toString
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = Validation.q292TCloseness(spark, tmp).collect()
      .map(r => r.getAs[Int]("nation") -> (r.getAs[Long]("class_k"),
        r.getAs[Float]("emd"), r.getAs[Boolean]("violates_t"))).toMap
    assert(got(1) == ((10L, 0.5f, true)))
    assert(got(2) == ((30L, (400.0 / 2400.0).toFloat, false)))
  }
}

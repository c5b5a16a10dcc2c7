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
}

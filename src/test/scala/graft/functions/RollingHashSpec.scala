package graft.functions

import graft.SparkSpec

class RollingHashSpec extends SparkSpec {

  test("rolling recurrence equals direct per-window hashing") {
    val t = "the quick brown fox jumps over the lazy dog"
    val k = 8
    val rolled = RollingHash.hashes(t, k)
    val direct = t.sliding(k).map(_.foldLeft(0L)((h, c) => h * 1000003L + c)).toArray
    assert(rolled.sameElements(direct))
  }

  test("winnowing guarantee: long shared substrings share a fingerprint") {
    val a = "xxxx the quick brown fox jumps over the lazy dog yyyy"
    val b = "aaaaaaa the quick brown fox jumps over the lazy dog bb"
    val fa = RollingHash.fingerprint(a).toSet
    val fb = RollingHash.fingerprint(b).toSet
    assert((fa & fb).nonEmpty) // shared region >> k + w - 1
    val c = "completely different content with no overlap at all!!"
    assert((fa & RollingHash.fingerprint(c).toSet).isEmpty)
  }

  test("edit locality: a point edit preserves most fingerprints") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a.replace("jumps", "leaps")
    val fa = RollingHash.fingerprint(a).toSet
    val fb = RollingHash.fingerprint(b).toSet
    val jacc = (fa & fb).size.toDouble / (fa | fb).size
    assert(jacc > 0.5, s"jaccard=$jacc")
  }

  test("short/empty inputs are safe") {
    assert(RollingHash.fingerprint("").isEmpty)
    assert(RollingHash.fingerprint("abc").isEmpty) // shorter than k
    assert(RollingHash.hashes(null, 8).isEmpty)
  }

  test("works over documents via the typed lane") {
    import spark.implicits._
    val n = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"text").as[String]
      .map(t => RollingHash.fingerprint(t)).toDF("fp")
      .selectExpr("size(fp) AS n").agg(org.apache.spark.sql.functions.min("n"))
      .collect()(0).getInt(0)
    assert(n > 0)
  }
}

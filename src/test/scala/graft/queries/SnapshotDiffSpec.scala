package graft.queries

import graft.SparkSpec

/** Changelog synthesis from two snapshots (Diff.snapshotDiff). */
class SnapshotDiffSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def frames = {
    import spark.implicits._
    val old = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, null.asInstanceOf[String], 50.0)
    ).toDF("id", "name", "amount")
    val neu = Seq(
      (1L, "a", 10.0),                      // unchanged — must NOT appear
      (2L, "b", 21.0),                      // amount changed   → UPDATE
      (3L, "cc", 30.0),                     // name changed     → UPDATE
      // 4 missing                          → DELETE
      (5L, null.asInstanceOf[String], 50.0),// null == null     → unchanged
      (6L, "f", 60.0)                       // new key          → INSERT
    ).toDF("id", "name", "amount")
    (old, neu)
  }

  test("diff classifies INSERT/UPDATE/DELETE and drops unchanged rows") {
    val (old, neu) = frames
    val got = Diff.snapshotDiff(old, neu, Seq("id"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(got === Seq(
      ("UPDATE", 2L, "b", 21.0),
      ("UPDATE", 3L, "cc", 30.0),
      ("DELETE", 4L, "d", 40.0),
      ("INSERT", 6L, "f", 60.0)))
  }

  test("round-trip law: applying the diff to old reproduces new exactly") {
    val (old, neu) = frames
    val delta = Diff.snapshotDiff(old, neu, Seq("id")).cache()
    // latest-by-key apply: rows of old whose key the delta does not
    // touch, plus the INSERT/UPDATE images from the delta
    val untouched = old.join(delta.select("id"), Seq("id"), "left_anti")
    val applied = untouched.unionByName(
      delta.filter(col("op") =!= "DELETE").drop("op"))
    assert(applied.exceptAll(neu).isEmpty && neu.exceptAll(applied).isEmpty,
      "apply(diff(old,new), old) must equal new as a multiset")
    delta.unpersist()
  }

  test("null-safe compare: null->value and value->null are UPDATEs") {
    import spark.implicits._
    val old = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("id", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Option("y"))).toDF("id", "v")
    val ops = Diff.snapshotDiff(old, neu, Seq("id"))
      .orderBy($"id").select("op", "v").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(ops === Seq(("UPDATE", None), ("UPDATE", Some("y"))))
  }
}

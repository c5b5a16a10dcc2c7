package graft.sources

import graft.SparkSpec
import graft.model.Op
import graft.route.TopicRouter
import graft.transform.Handlers

/** Snapshot source semantics (reference S2 + snapshot_test.go:24-163):
  * all existing rows arrive as SNAPSHOT ops through the same pipeline as
  * CDC events.
  */
class SnapshotSourceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("snapshot surfaces every row as a SNAPSHOT ChangeEvent with stringified columns") {
    val snap = SnapshotSource.snapshot(spark, dir, "region")
    val rows = snap.collect()
    assert(rows.length == spark.read.parquet(s"$dir/region.parquet").count())
    assert(rows.forall(_.getAs[String]("op") == Op.Snapshot))
    val m = rows.head.getAs[Map[String, String]]("newData")
    assert(m.contains("r_regionkey") && m.contains("r_name"))
  }

  test("snapshot flows through the default handler into Kafka records") {
    val snap = SnapshotSource.snapshot(spark, dir, "nation")
    val recs = Handlers.declarative(snap,
      TopicRouter(Map("public.nation" -> "nation-topic")), "n_nationkey").collect()
    assert(recs.length == 25)
    assert(recs.forall(_.getAs[String]("topic") == "nation-topic"))
    assert(recs.forall(r => new String(r.getAs[Array[Byte]]("value")).contains(""""operation":"SNAPSHOT"""")))
  }

  test("multi-table snapshot multiplexes only the listed tables (publication pruning)") {
    val snap = SnapshotSource.snapshotTables(spark, dir, Seq("region", "nation"))
    val byTable = snap.groupBy("tableName").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable.keySet == Set("region", "nation"))
    assert(byTable("nation") == 25)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot diffing — synthesize a CDC changelog from two table
  * versions. This is the inverse of the apply direction (q46 /
  * Materialize): when replication was down, never enabled, or the slot
  * was lost (the reference's operational failure mode — a dropped slot
  * forces a fresh snapshot, `/root/reference/README.md:36-42`), the only
  * way to catch a replica up WITHOUT replaying a full snapshot is to
  * diff the two snapshots and emit the delta as INSERT/UPDATE/DELETE
  * events (the reference's `MessageType` names, `message.go:64-77`).
  *
  * At 100 TB: ONE full-outer sort-merge join on the primary key — both
  * sides shuffle exactly once on pk, compare is a per-row null-safe
  * predicate, no window, no driver state. Unchanged rows (the vast
  * majority in an incremental catch-up) are dropped before anything
  * downstream sees them. With both snapshots bucketed on pk (the
  * Bucketing lane) even those two shuffles disappear.
  */
object Diff {

  /** Changelog synthesis: compare `oldDf` and `newDf` on `pk`; emit one
    * row per difference, tagged INSERT (new only), DELETE (old only) or
    * UPDATE (both present, any compared column differing under null-safe
    * equality). Value columns are the new image for INSERT/UPDATE and
    * the old image for DELETE — exactly what a downstream latest-by-key
    * apply needs to reproduce `newDf` from `oldDf` (SnapshotDiffSpec
    * proves the round-trip law).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String]): DataFrame = {
    val compare = newDf.columns.filterNot(pk.contains).toSeq
    val o = oldDf.as("o")
    val n = newDf.as("n")
    val joinCond = pk.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val changed: Column = compare
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val newMissing = pk.map(k => col(s"n.$k").isNull).reduce(_ && _)
    val oldMissing = pk.map(k => col(s"o.$k").isNull).reduce(_ && _)
    o.join(n, joinCond, "full_outer")
      .withColumn("op",
        when(newMissing, lit("DELETE"))
          .when(oldMissing, lit("INSERT"))
          .when(changed, lit("UPDATE")))
      .filter(col("op").isNotNull)
      .select(col("op") +:
        pk.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++:
        // New image for INSERT/UPDATE, old image for DELETE — a plain
        // coalesce(new, old) would resurrect the OLD value on a
        // value→null UPDATE (SnapshotDiffSpec pins this).
        compare.map(c => when(col("op") === "DELETE", col(s"o.$c"))
          .otherwise(col(s"n.$c")).as(c)): _*)
  }

  /** q141: snapshot-diff changelog over two deterministically derived
    * versions of `orders` — old drops keys ≡0 (mod 101) (so those are
    * INSERTs), new drops keys ≡0 (mod 97) (DELETEs) and doubles
    * o_totalprice on keys ≡0 (mod 89) (UPDATEs; ×2 is exponent
    * arithmetic, exact in IEEE, so both engines compare bit-equal
    * doubles). The oracle states the same diff as a FULL OUTER JOIN.
    */
  def q141SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val oldV = orders.filter($"o_orderkey" % 101 =!= 0)
    val newV = orders.filter($"o_orderkey" % 97 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 89 === 0, $"o_totalprice" * 2)
          .otherwise($"o_totalprice"))
    snapshotDiff(oldV, newV, Seq("o_orderkey"))
      .orderBy($"o_orderkey")
  }

  val q141SnapshotDiffSql: String =
    """WITH oldv AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 101 <> 0),
      |newv AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0)
      |SELECT
      |  CASE WHEN n.o_orderkey IS NULL THEN 'DELETE'
      |       WHEN o.o_orderkey IS NULL THEN 'INSERT'
      |       ELSE 'UPDATE' END AS op,
      |  COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
      |  CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey
      |       ELSE n.o_custkey END AS o_custkey,
      |  CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
      |       ELSE n.o_totalprice END AS o_totalprice
      |FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
      |WHERE n.o_orderkey IS NULL OR o.o_orderkey IS NULL
      |   OR o.o_custkey IS DISTINCT FROM n.o_custkey
      |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |ORDER BY o_orderkey""".stripMargin
}

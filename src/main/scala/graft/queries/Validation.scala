package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Migration validation — the answer to "does the replica match the
  * source?" after a CDC cutover (the reference world's operational
  * acceptance test; the reference itself offers nothing here, a real
  * user diffs tables by hand). The primitive is an order-independent
  * table checksum: a 60-bit hash per canonicalized row, XOR-folded per
  * key bucket. XOR is commutative/associative and overflow-free, so the
  * checksum is partitioning- and order-insensitive by construction, and
  * per-BUCKET sums localize a divergence to 1/16th of the keyspace
  * instead of one all-or-nothing verdict (re-bucket recursively to
  * binary-search a corrupt range at 100 TB — each pass is one map-side
  * scan + a 16-row aggregate).
  *
  * Canonicalization avoids every engine-variance trap: exact-decimal
  * money columns cast to DECIMAL(12,2) before stringifying (never a
  * computed double), dates render ISO, nulls become a sentinel distinct
  * from any value, and the hash is an md5 prefix (byte-identical
  * everywhere) rather than an engine-private hash function.
  */
object Validation {

  /** q115: per-bucket XOR checksum + row count over lineitem. */
  def q115ReplicaChecksum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val canon = concat_ws("|",
      $"l_orderkey".cast("string"),
      $"l_linenumber".cast("string"),
      coalesce($"l_quantity".cast("decimal(12,2)").cast("string"), lit("∅")),
      coalesce($"l_extendedprice".cast("decimal(12,2)").cast("string"), lit("∅")),
      coalesce($"l_returnflag", lit("∅")),
      coalesce($"l_shipdate".cast("string"), lit("∅")))
    Tables.load(s, dir, "lineitem")
      .select(($"l_orderkey" % 16).as("bucket"),
        conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy($"bucket")
      .agg(expr("bit_xor(h)").as("checksum"), count(lit(1)).as("n_rows"))
      .orderBy($"bucket")
  }

  val q115ReplicaChecksumSql: String =
    """WITH h AS (
      |  SELECT l_orderkey % 16 AS bucket,
      |    CAST(('0x' || substring(md5(
      |      CAST(l_orderkey AS VARCHAR) || '|' ||
      |      CAST(l_linenumber AS VARCHAR) || '|' ||
      |      COALESCE(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR), '∅') || '|' ||
      |      COALESCE(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '∅') || '|' ||
      |      COALESCE(l_returnflag, '∅') || '|' ||
      |      COALESCE(CAST(l_shipdate AS VARCHAR), '∅')), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem)
      |SELECT bucket, bit_xor(h) AS checksum, CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin
}

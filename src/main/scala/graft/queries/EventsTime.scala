package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Exact._

/** Event-time processing in batch mode: tumbling windows (the batch twin of
  * the streaming `window()` aggregation in graft.streaming) and the scalar
  * function surface (string/date/JSON — SURVEY §2B "Scalar fns", re-expressing
  * the reference handlers' JSON serialization, key extraction and header
  * construction as codegen'd column expressions).
  */
object EventsTime {

  /** Tumbling 1-hour window aggregate over the event stream, batch mode.
    * `window($"ts", "1 hour")` buckets exactly like
    * `to_timestamp(floor(epoch_us/3600e6)*3600)` — asserted by the oracle.
    */
  def q20Tumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"window_start", $"event_type")
  }

  val q20TumblingSql: String =
    s"""SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
      | event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Scalar-function surface over one projection: JSON extraction
    * (`get_json_object` ≙ reference handler's json.Marshal round-trip),
    * string ops (upper/lpad/substring/concat — cf. LPAD in the reference's
    * snapshot fixture), date parts, and conditional logic. Pure map-side:
    * zero shuffles at any scale.
    */
  def q21ScalarFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .filter($"event_id" < 2000)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast("long").as("k_val"),
        upper($"event_type").as("type_upper"),
        lpad($"user_id".cast("string"), 8, "0").as("user_padded"),
        concat($"event_type", lit(":"), $"user_id".cast("string")).as("event_key"),
        substring($"event_type", 1, 2).as("type_prefix"),
        length($"event_type").as("type_len"),
        year($"ts").as("y"),
        month($"ts").as("m"),
        dayofmonth($"ts").as("d"),
        hour($"ts").as("h"),
        date_trunc("day", $"ts").as("day_ts"),
        when($"value" >= 100.0, "big").when($"value" >= 10.0, "mid")
          .otherwise("small").as("value_band"))
      .orderBy($"event_id")
  }

  /** Null-safe equality (`<=>`) and null-handling functions: NULLs are
    * manufactured with nullif, then compared with null-safe semantics —
    * `<=>` is true for NULL<=>NULL where `=` yields NULL. DuckDB twin is
    * IS NOT DISTINCT FROM.
    */
  def q23NullSafe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seg  = nullif($"c_mktsegment", lit("BUILDING"))
    val bal  = nullif($"c_acctbal", lit(0.0))
    Tables.load(s, dir, "customer")
      .select(
        $"c_custkey",
        seg.as("seg_or_null"),
        ($"c_mktsegment" <=> "BUILDING").as("is_building_nullsafe"),
        (seg <=> lit(null).cast("string")).as("seg_is_null_nullsafe"),
        coalesce(seg, lit("(default)")).as("seg_coalesced"),
        isnull(bal).as("bal_zeroed"))
      .orderBy($"c_custkey")
  }

  val q23NullSafeSql: String =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
      |  c_mktsegment IS NOT DISTINCT FROM 'BUILDING' AS is_building_nullsafe,
      |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS seg_is_null_nullsafe,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_coalesced,
      |  nullif(c_acctbal, 0.0) IS NULL AS bal_zeroed
      |FROM customer ORDER BY c_custkey""".stripMargin

  val q21ScalarFuncsSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  UPPER(event_type) AS type_upper,
      |  LPAD(CAST(user_id AS VARCHAR), 8, '0') AS user_padded,
      |  event_type || ':' || CAST(user_id AS VARCHAR) AS event_key,
      |  SUBSTRING(event_type, 1, 2) AS type_prefix,
      |  CAST(LENGTH(event_type) AS INT) AS type_len,
      |  CAST(YEAR(ts) AS INT) AS y,
      |  CAST(MONTH(ts) AS INT) AS m,
      |  CAST(DAY(ts) AS INT) AS d,
      |  CAST(HOUR(ts) AS INT) AS h,
      |  date_trunc('day', ts) AS day_ts,
      |  CASE WHEN value >= 100.0 THEN 'big' WHEN value >= 10.0 THEN 'mid'
      |       ELSE 'small' END AS value_band
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin
}

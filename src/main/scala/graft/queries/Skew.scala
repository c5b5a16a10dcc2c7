package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY scale notes): salting for hot
  * aggregation keys and for hot join keys.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in this
  * engine's sessions) already splits skewed SHUFFLE partitions at
  * runtime; these helpers cover the cases AQE can't: a single hot GROUP
  * BY key (AQE cannot split one key's final aggregation) and
  * broadcast-ineligible joins against a replicated small side.
  */
object Skew {

  /** Two-phase salted aggregation for re-aggregatable functions: partial
    * aggregate on (key, salt) — spreading one hot key over `salts`
    * reducers — then final aggregate on key. sum/count/min/max compose;
    * avg must be decomposed into sum+count by the caller.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("cnt"))

  /** Salted join for a skewed left key column against a small-but-not-
    * broadcastable right side: left gets a random-ish salt in [0, salts),
    * right is replicated `salts` times, join key becomes (key, salt) —
    * one hot key now lands on `salts` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}

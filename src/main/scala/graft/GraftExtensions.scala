package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.CosineSimilarity

/** Engine extensions, installed via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `GraftExtensions.register(spark)`: native expressions the built-in
  * function surface lacks (SURVEY §7 custom-Catalyst lane).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes exactly 2 arguments")
        CosineSimilarity(args.head, args(1))
      }))
  }
}

object GraftExtensions {
  /** Register on an already-built session (covers the test/REPL path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("cosine_similarity"),
      CosineSimilarity.info,
      args => { require(args.length == 2); CosineSimilarity(args.head, args(1)) })
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** The WHOLE-OPERATOR rung of the custom-Catalyst ladder (SURVEY §7c):
  * an AS-OF join as a first-class plan node — logical [[AsofJoinPlan]],
  * planner [[AsofJoinStrategy]], physical [[AsofJoinExec]] — instead of
  * the union-tag-window composition `queries/AsofJoin.q17Asof` uses.
  *
  * Why an operator and not a composition: the physical node declares
  * `requiredChildDistribution` (cluster both sides on the key) and
  * `requiredChildOrdering` ((key, time) each side), so Spark's
  * EnsureRequirements inserts exactly one exchange + sort per side —
  * the same cost envelope as a sort-merge join — and the merge itself
  * is a single forward pass per partition holding ONE buffered right
  * row: no union-row widening, no window-function machinery, no
  * carried null columns. At 100 TB both shapes shuffle the same bytes;
  * the operator cuts the post-shuffle work (measured ~20% on the q17
  * lane at sf0.1 warm — 0.70 s vs 0.87 s — with only 3 narrow right
  * columns; the union composition's cost grows with the width of BOTH
  * sides, the operator's only with the matched output) and is reusable
  * from any plan, which is the point of owning the node.
  *
  * Semantics (PUBLIC as-of convention — pandas merge_asof backward /
  * QuestDB ASOF JOIN): for each left row, the right row with equal key
  * and the greatest time <= left time; ties on right time resolved by
  * the LAST row in (time, tieBreak) order. Left rows with no match
  * keep null right columns (left-outer flavor). Null keys/times never
  * match.
  *
  * v1 scope: keys and times evaluate to integral types (long/int/
  * timestamp/date) — the shapes time-series joins actually use;
  * enforced at construction.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  Seq(leftKey, rightKey, leftTime, rightTime).foreach { e =>
    require(Seq(LongType, IntegerType, TimestampType, TimestampNTZType, DateType)
      .contains(e.dataType),
      s"asof join v1 supports integral key/time types, got ${e.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // cluster both sides on the key; EnsureRequirements co-partitions and
  // inserts the sorts below — the SortMergeJoin contract
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(e => SortOrder(e, Ascending)))

  // rows stream out in the left child's order and partitioning
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => other.asInstanceOf[Long]
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      // one buffered candidate: the latest right row whose (key, time)
      // has been passed by the merge frontier
      var cand: InternalRow = null
      var candKey = 0L
      var next: InternalRow = null
      var nextKey = 0L
      var nextTime = 0L
      def advance(): Unit = {
        next = null
        while (next == null && rIter.hasNext) {
          val r = rIter.next()
          val kv = rk.eval(r)
          val tv = rt.eval(r)
          if (kv != null && tv != null) {
            next = r
            nextKey = toLong(kv)
            nextTime = toLong(tv)
          } // null key/time rows can never match: skip
        }
      }
      advance()
      lIter.map { lrow =>
        val kv = lk.eval(lrow)
        val tv = lt.eval(lrow)
        if (kv != null && tv != null) {
          val k = toLong(kv)
          val t = toLong(tv)
          while (next != null &&
              (nextKey < k || (nextKey == k && nextTime <= t))) {
            cand = next.copy() // iterator reuses row buffers
            candKey = nextKey
            advance()
          }
          if (cand != null && candKey == k) joined(lrow, cand)
          else joined(lrow, nullRight)
        } else joined(lrow, nullRight)
        project(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object NativeAsof {
  /** Install the planner strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
  }

  /** DataFrame-level entry point: `asofJoin(events, orders, ...)` gives
    * every left row the latest right row at-or-before its time, per
    * key. Column name collisions between the two sides are the
    * caller's to resolve (select/alias first), as with any join.
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightTieBreak: Seq[Column] = Nil): DataFrame = {
    val spark = leftDf.sparkSession
    register(spark)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def resolve(c: Column, p: LogicalPlan, side: String): Expression = {
      val name = c.toString
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: column `$name` not found on the $side side " +
            s"(available: ${p.output.map(_.name).mkString(", ")})"))
    }
    val plan = AsofJoinPlan(lp, rp,
      resolve(leftKey, lp, "left"), resolve(rightKey, rp, "right"),
      resolve(leftTime, lp, "left"), resolve(rightTime, rp, "right"),
      rightTieBreak.map(resolve(_, rp, "right")))
    org.apache.spark.sql.graft.PlanShim.ofRows(spark, plan)
  }
}

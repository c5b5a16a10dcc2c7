package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.route.TopicRouter
import graft.sources.SnapshotSource
import graft.transform.Handlers
import graft.streaming.PipelineProbe

/** Diagnose where the probe lane's overhead lives: plan shape (lost
  * pushdown/collapse) vs per-row helper cost vs sink-side probe.
  */
object ProbeDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val router = TopicRouter(Map("public.lineitem" -> "lineitem-topic"))
    def events = SnapshotSource.snapshot(spark, sfDir, "lineitem")
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val lanes: Seq[(String, () => DataFrame)] = Seq(
      "envelope" -> (() => Handlers.debeziumEnvelope(events, router, "l_orderkey")),
      "env+pre-probe" -> (() => {
        val p = new PipelineProbe(spark.sparkContext, router, "l_orderkey", "diag")
        Handlers.debeziumEnvelope(p.attach(events), router, "l_orderkey")
      }),
      "env+sink-probe" -> (() => {
        val p = new PipelineProbe(spark.sparkContext, router, "l_orderkey", "diag")
        p.attachSink(Handlers.debeziumEnvelope(events, router, "l_orderkey"))
      }),
      // pre-probe wired to constant-null maps: same plan shape, but the
      // helper never walks a MapData — isolates map-arg cost
      "env+pre-probe-nomaps" -> (() => {
        val p = new PipelineProbe(spark.sparkContext, router, "l_orderkey", "diag")
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
        import org.apache.spark.sql.types.{MapType, StringType}
        val nullMap = Cast(Literal(null), MapType(StringType, StringType))
        val e = graft.streaming.PipelineProbeExpr(Seq(
          UnresolvedAttribute(Seq("op")), UnresolvedAttribute(Seq("tableNamespace")),
          UnresolvedAttribute(Seq("tableName")), UnresolvedAttribute(Seq("eventTime")),
          nullMap, nullMap), p)
        Handlers.debeziumEnvelope(
          events.withColumn("op", org.apache.spark.sql.graft.PlanShim.column(e)),
          router, "l_orderkey")
      }))

    lanes.foreach { case (_, mk) => run(mk()) }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      lanes.foreach { case (tag, mk) =>
        val df = mk()
        val t0 = System.nanoTime(); run(df)
        samples(tag) = samples(tag) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    lanes.foreach { case (tag, _) =>
      val ts = samples(tag).sorted
      println(f"$tag%-22s min ${ts.min}%.3f s  (attempts ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    // plan audit: count codegen stages in the pre-probe lane
    val p = new PipelineProbe(spark.sparkContext, router, "l_orderkey", "diag")
    val df = Handlers.debeziumEnvelope(p.attach(events), router, "l_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println("=== probe lane plan (final) ===")
    println(plan.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}

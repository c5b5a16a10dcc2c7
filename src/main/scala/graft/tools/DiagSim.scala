package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for q42's candidate-generation cost (not a
  * registered tool): counts bucket-join candidate pairs under the
  * current 13-narrow-block scheme and variants, to size the fix for
  * the derived-decade blowup before implementing it.
  */
object DiagSim {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.GraftExtensions.register(spark)

    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), call_function("word_shingle_hashes", col("text")).as("sh"))
    val sim = docs.select($"doc_id", size($"sh").as("n"),
      call_function("simhash64", $"sh").as("simhash")).cache()
    println(s"docs: ${sim.count()}")

    // per-block chunk values, current scheme
    val chunks = sim.select($"doc_id", $"n", $"simhash",
        explode(expr(
          """transform(sequence(0, 12), c -> struct(c AS chunk,
            |  shiftright(simhash, cast(c*64 div 13 AS int))
            |    & (shiftleft(1L, cast((c+1)*64 div 13 - c*64 div 13 AS int)) - 1) AS cv))""".stripMargin))
          .as("cc"))
      .select($"doc_id", $"n", $"cc.chunk", $"cc.cv")

    // candidate enumeration cost = sum over buckets of c*(c-1)/2
    val cur = chunks.groupBy($"chunk", $"cv").count()
      .agg(sum(($"count" * ($"count" - 1) / 2).cast("double"))).as[Double].head
    println(s"current (chunk,cv) candidate pairs: ${cur.toLong}")

    val band = floor(log($"n") / log(lit(1.25))).cast("int")
    val banded = chunks.withColumn("band", band)
    val bcnt = banded.groupBy($"chunk", $"cv", $"band").count().cache()
    val sameB = bcnt.agg(sum(($"count" * ($"count" - 1) / 2).cast("double"))).as[Double].head
    val adjB = bcnt.as("x").join(bcnt.as("y"),
        $"x.chunk" === $"y.chunk" && $"x.cv" === $"y.cv" && $"x.band" === $"y.band" - 1)
      .agg(sum(($"x.count" * $"y.count").cast("double"))).as[Double].head
    println(s"banded same: $sameB adj: $adjB total: ${(sameB + adjB).toLong}")

    // top skewed buckets
    bcnt.orderBy(desc("count")).show(10, false)
    // bit bias profile
    val bits = sim.select((0 until 64).map(i =>
      sum(shiftright($"simhash", i).bitwiseAND(1).cast("long")).as(s"b$i")): _*).head()
    val n = sim.count().toDouble
    val biases = (0 until 64).map(i => bits.getLong(i) / n)
    println("bit one-fractions: " + biases.map(b => f"$b%.2f").mkString(" "))
    spark.stop()
  }
}
/** Times just the candidate-join stage under different shapes. */
object DiagSimJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.GraftExtensions.register(spark)

    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), call_function("word_shingle_hashes", col("text")).as("sh"))
    val sim = docs.select($"doc_id", size($"sh").as("n"),
      call_function("simhash64", $"sh").as("simhash")).cache()
    sim.count()

    def chunksOf(df: org.apache.spark.sql.DataFrame) = df.select($"doc_id", $"n", $"simhash",
        explode(expr(
          """transform(sequence(0, 12), c -> struct(c AS chunk,
            |  shiftright(simhash, cast(c*64 div 13 AS int))
            |    & (shiftleft(1L, cast((c+1)*64 div 13 - c*64 div 13 AS int)) - 1) AS cv))""".stripMargin))
          .as("cc"))
      .select($"doc_id", $"simhash", $"n", $"cc.chunk", $"cc.cv")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s -> $r")
    }

    val chunks = chunksOf(sim).cache(); chunks.count()

    // shape 1: current (join carries simhash both sides, then distinct)
    val a1 = chunks.select($"doc_id".as("d1"), $"chunk", $"cv", $"simhash".as("s1"))
    val b1 = chunks.select($"doc_id".as("d2"), $"chunk".as("chunk2"), $"cv".as("cv2"), $"simhash".as("s2"))
    time("current join+distinct") {
      a1.join(b1, $"chunk" === $"chunk2" && $"cv" === $"cv2" && $"d1" < $"d2" &&
        expr("bit_count(s1 ^ s2) <= 12")).select($"d1", $"d2").distinct().count()
    }

    // shape 2: banded
    val band = floor(log($"n") / log(lit(1.25))).cast("int")
    val cb = chunks.withColumn("band", band)
    val a2 = cb.withColumn("pband", explode(array($"band" - 1, $"band", $"band" + 1)))
      .select($"doc_id".as("d1"), $"chunk", $"cv", $"pband", $"simhash".as("s1"))
    val b2 = cb.select($"doc_id".as("d2"), $"chunk".as("chunk2"), $"cv".as("cv2"),
      $"band".as("band2"), $"simhash".as("s2"))
    time("banded join+distinct") {
      a2.join(b2, $"chunk" === $"chunk2" && $"cv" === $"cv2" && $"pband" === $"band2" &&
        $"d1" < $"d2" && expr("bit_count(s1 ^ s2) <= 12")).select($"d1", $"d2").distinct().count()
    }
    spark.stop()
  }
}
/** Stage-by-stage timing of the REAL q42 path to localize the sf1d cost. */
object DiagQ42 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
      r
    }
    val df = time("q42 build")(graft.queries.Dedup.q42Simhash(spark, dir))
    df.explain("formatted")
    time("q42 run 1")(df.write.format("noop").mode("overwrite").save())
    val df2 = time("q42 rebuild")(graft.queries.Dedup.q42Simhash(spark, dir))
    time("q42 run 2")(df2.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
/** BHJ-vs-SMJ isolate for the q42 candidate join. */
object DiagSimJoin2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.GraftExtensions.register(spark)

    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), call_function("word_shingle_hashes", col("text")).as("sh"))
    val sim = docs.select($"doc_id",
      call_function("simhash64", $"sh").as("simhash")).cache()
    sim.count()

    val chunks = sim.select($"doc_id", $"simhash",
        explode(expr(
          """transform(sequence(0, 12), c -> struct(c AS chunk,
            |  shiftright(simhash, cast(c*64 div 13 AS int))
            |    & (shiftleft(1L, cast((c+1)*64 div 13 - c*64 div 13 AS int)) - 1) AS cv))""".stripMargin))
          .as("cc"))
      .select($"doc_id", $"simhash", $"cc.chunk", $"cc.cv")
    val a = chunks.select($"doc_id".as("d1"), $"chunk", $"cv", $"simhash".as("s1"))
    val b = chunks.select($"doc_id".as("d2"), $"chunk".as("chunk2"), $"cv".as("cv2"), $"simhash".as("s2"))

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s -> $r")
    }
    val joined = a.join(b, $"chunk" === $"chunk2" && $"cv" === $"cv2" && $"d1" < $"d2" &&
      expr("bit_count(s1 ^ s2) <= 12")).select($"d1", $"d2").distinct()
    println("plan (default):")
    joined.explain()
    time("uncached-explode (default strategy)") { joined.count() }
    val merged = a.hint("merge").join(b, $"chunk" === $"chunk2" && $"cv" === $"cv2" && $"d1" < $"d2" &&
      expr("bit_count(s1 ^ s2) <= 12")).select($"d1", $"d2").distinct()
    time("merge-hint (SMJ)") { merged.count() }
    val shj = a.hint("shuffle_hash").join(b, $"chunk" === $"chunk2" && $"cv" === $"cv2" && $"d1" < $"d2" &&
      expr("bit_count(s1 ^ s2) <= 12")).select($"d1", $"d2").distinct()
    time("shuffle_hash hint (SHJ)") { shj.count() }
    spark.stop()
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ordered_fold must be BIT-IDENTICAL to the declarative
  * array_sort/transform/aggregate chain it replaces (r16 optimization):
  * same sort order (natural ascending struct order — key then value,
  * including TIED keys), same sequential double accumulation, same
  * null propagation (any null value nulls the fold).
  */
class OrderedFoldSpec extends SparkSpec {

  private def declarative(pos: Column, term: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(pos.as("pos"), term.as("t")))),
        x => x.getField("t")),
      lit(0.0), (acc, x) => acc + x)

  private def native(pos: Column, term: Column): Column = {
    graft.GraftExtensions.register(spark)
    call_function("ordered_fold",
      collect_list(struct(pos.as("pos"), term.cast("double").as("t"))))
  }

  test("equals the declarative fold on random grouped doubles (long keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (i % 97, rnd.nextInt(100000).toLong, math.log1p(rnd.nextDouble()) - 0.3)
    }
    val df = rows.toDF("g", "pos", "t")
    val got = df.groupBy($"g").agg(native($"pos", $"t").as("s"))
    val want = df.groupBy($"g").agg(declarative($"pos", $"t").as("s"))
    val diff = got.join(want, Seq("g"))
      .filter(got("s") =!= want("s") ||
        got("s").isNull =!= want("s").isNull)
    assert(diff.isEmpty, diff.take(3).mkString)
  }

  test("equals the declarative fold under TIED keys (value breaks the tie)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // few distinct keys per group => many ties; sums of 3+ distinct
    // doubles detect any order difference in the accumulation
    val rows = (1 to 4000).map { i =>
      (i % 31, (rnd.nextInt(4)).toLong, rnd.nextDouble() * 2.0 - 1.0)
    }
    val df = rows.toDF("g", "pos", "t")
    val got = df.groupBy($"g").agg(native($"pos", $"t").as("s"))
    val want = df.groupBy($"g").agg(declarative($"pos", $"t").as("s"))
    val diff = got.join(want, Seq("g")).filter(got("s") =!= want("s"))
    assert(diff.isEmpty, diff.take(3).mkString)
  }

  test("string and struct keys order identically to array_sort") {
    import spark.implicits._
    val rows = Seq(
      (1, "zebra", 0.25), (1, "alpha", -1.5), (1, "alpha ", 3.125),
      (2, "", 1.0), (2, "b", 2.0), (2, "a", 4.0))
    val df = rows.toDF("g", "k", "t")
    val got = df.groupBy($"g").agg(native($"k", $"t").as("s"))
    val want = df.groupBy($"g").agg(declarative($"k", $"t").as("s"))
    assert(got.join(want, Seq("g")).filter(got("s") =!= want("s")).isEmpty)
    // nested-struct key (the q217 time-decay site's shape)
    val df2 = rows.toDF("g", "k", "t")
      .select($"g", struct($"k", ($"t" > 0).as("b")).as("k2"), $"t")
    val got2 = df2.groupBy($"g").agg(native($"k2", $"t").as("s"))
    val want2 = df2.groupBy($"g").agg(declarative($"k2", $"t").as("s"))
    assert(got2.join(want2, Seq("g")).filter(got2("s") =!= want2("s")).isEmpty)
  }

  test("null values propagate to a null fold; empty-ish groups match") {
    import spark.implicits._
    val df = Seq((1, 1L, Some(1.0)), (1, 2L, None), (2, 1L, Some(0.5)))
      .toDF("g", "pos", "t")
    val got = df.groupBy($"g").agg(native($"pos", $"t").as("s"))
      .orderBy($"g").collect()
    val want = df.groupBy($"g").agg(declarative($"pos", $"t").as("s"))
      .orderBy($"g").collect()
    assert(got.map(r => (r.getInt(0), r.isNullAt(1))).toSeq ===
      want.map(r => (r.getInt(0), r.isNullAt(1))).toSeq)
    assert(got(1).getDouble(1) === want(1).getDouble(1))
  }
}

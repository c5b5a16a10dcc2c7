package graft.queries

import org.scalacheck.Gen

import graft.SparkSpec
import graft.queries.Windows.latestByKey

/** Property tests for distribution laws the engine relies on:
  * partitioning preserves multisets (the reference's chunking law,
  * `internal/slices/slices.go:3-16` — order within a chunk, nothing lost,
  * nothing duplicated), latest-by-key compaction matches a reference
  * model, and approx_count_distinct stays within its advertised error.
  */
class PropertiesSpec extends SparkSpec {

  test("property: repartition preserves the multiset (chunking law)") {
    import spark.implicits._
    val data = graft.GenUtil.sampled(Gen.listOfN(500, Gen.chooseNum(-1000L, 1000L)))
    val df = data.toDF("v")
    for (n <- Seq(1, 3, 7, 32)) {
      val got = df.repartition(n).as[Long].collect().sorted.toSeq
      assert(got == data.sorted, s"multiset changed at n=$n")
    }
  }

  test("property: latestByKey matches the groupBy-max reference model") {
    import spark.implicits._
    val rows = graft.GenUtil.sampled(Gen.listOfN(300, for {
      k  <- Gen.chooseNum(0, 20)
      t  <- Gen.chooseNum(0L, 50L)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (k, t, id))).distinct
    val df = rows.toDF("k", "t", "id")
    val got = latestByKey(df, Seq("k"), Seq("t", "id"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val model = rows.groupBy(_._1).view.mapValues(g => g.map(r => (r._2, r._3)).max).toMap
    assert(got == model)
  }

  test("property: q108 wildcard blocking == same-length brute force on random names") {
    import spark.implicits._
    import java.nio.file.Files
    // adversarial shape: tiny alphabet + short strings, so distance-1
    // pairs, identical names, and different-length pairs all occur
    val names = Gen.listOfN(120, for {
      len <- Gen.chooseNum(3, 5)
      cs  <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString).sample.get
    val tmp = Files.createTempDirectory("graft-er-prop").toString
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = Entity.q108EntityPairs(spark, tmp)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val idx = names.zipWithIndex
    def lev1(a: String, b: String) = // same length: distance <= 1 == <= 1 substitution
      a.length == b.length && a.zip(b).count { case (x, y) => x != y } <= 1
    val model = (for {
      (a, i) <- idx; (b, j) <- idx
      if i < j && lev1(a, b)
    } yield (i.toLong, j.toLong)).toSet
    assert(got == model)
  }

  test("property: native word_shingle_hashes == declarative chain on random texts") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // word-salad texts incl. empty words (consecutive/leading/trailing
    // spaces survive split(" ") as empty strings and must round-trip)
    val word = Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""))
    val texts = Gen.listOfN(200, Gen.listOf(word).map(_.mkString(" "))).sample.get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val diff = df.selectExpr("doc_id", "word_shingle_hashes(text) AS a",
        "array_sort(array_distinct(transform(" +
          "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1))," +
          "  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))," +
          " g -> xxhash64(g)))) AS b")
      .filter("a <> b").count()
    assert(diff == 0)
  }

  test("property: q73 chunks cover every token, overlap by window-stride, start at 0") {
    val s = spark
    import s.implicits._
    val rows = TextOps.q73Chunk(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._3) // by chunk_idx
      val n = sorted.head._2
      assert(sorted.head._4 == 0L, s"doc $doc: first chunk must start at 0")
      assert(sorted.last._5 == n, s"doc $doc: last chunk must end at n_tokens")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._4 + 48, s"doc $doc: stride broken")
          assert(b._4 < a._5, s"doc $doc: gap between chunks — token uncovered")
        case _ => ()
      }
    }
  }

  test("approx_percentile honors its rank-accuracy contract vs the exact percentile") {
    val s = spark
    import s.implicits._
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val acc = 100 // rank error <= n/acc by the GK-sketch contract
    val Array(n, approx, exactLo, exactHi) = {
      val cnt = li.count()
      val a = li.selectExpr(s"approx_percentile(l_quantity, 0.5, $acc)").collect()(0).getDouble(0)
      val err = (cnt / acc).toInt
      val sorted = li.select($"l_quantity".cast("double")).orderBy($"l_quantity")
        .collect().map(_.getDouble(0))
      val mid = (cnt / 2).toInt
      Array(cnt.toDouble, a,
        sorted(math.max(mid - err, 0)), sorted(math.min(mid + err, sorted.length - 1)))
    }
    assert(approx >= exactLo && approx <= exactHi,
      s"approx median $approx outside rank-error window [$exactLo, $exactHi] (n=$n)")
  }

  test("approx_count_distinct is within its relative-error bound (HLL surface)") {
    import spark.implicits._
    val orders = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val exact = orders.select("o_custkey").distinct().count()
    val approx = orders.selectExpr("approx_count_distinct(o_custkey, 0.02) AS a")
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("property: KS of a sample against itself is 0, against a disjoint shift is 1") {
    import spark.implicits._
    import java.nio.file.Files
    val vals = Gen.listOfN(200, Gen.chooseNum(1, 500)).sample.get
    val tmp = Files.createTempDirectory("graft-ks-prop").toString
    // A and B are the SAME multiset -> ECDFs coincide everywhere
    (vals.map(v => (v.toDouble, "1-URGENT")) ++
      vals.map(v => (v.toDouble, "5-LOW")))
      .toDF("o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val same = Stats.q144KsDrift(spark, tmp).collect().head
    assert(same.getAs[Double]("ks_d") == 0.0)
    val tmp2 = Files.createTempDirectory("graft-ks-prop2").toString
    (vals.map(v => (v.toDouble, "1-URGENT")) ++
      vals.map(v => (v.toDouble + 1000.0, "5-LOW")))
      .toDF("o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp2/orders.parquet")
    val apart = Stats.q144KsDrift(spark, tmp2).collect().head
    assert(apart.getAs[Double]("ks_d") == 1.0)
  }

  test("property: water-fill allocations sum to the budget and cap at supply") {
    import spark.implicits._
    import java.nio.file.Files
    val supplies = Gen.listOfN(8, Gen.chooseNum(1, 200)).sample.get
    val tmp = Files.createTempDirectory("graft-wf-prop").toString
    supplies.zipWithIndex.map { case (n, i) =>
      (i.toLong, s"s$i", Seq.fill(n)("t").mkString(" "))
    }.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Sampling.q149Waterfill(spark, tmp).collect()
    val total = supplies.map(_.toLong).sum
    val budget = total * 2 / 5
    val allocs = rows.map(r => r.getAs[String]("source") -> r.getAs[Double]("alloc")).toMap
    assert(math.abs(allocs.values.sum - budget) < 1e-6,
      s"sum=${allocs.values.sum} budget=$budget")
    rows.foreach { r =>
      assert(r.getAs[Double]("alloc") <= r.getAs[Long]("tokens") + 1e-9)
      assert(r.getAs[Double]("weight") <= 1.0 + 1e-12)
    }
  }

  test("property: quantile normalization preserves within-source order and global range") {
    import spark.implicits._
    import java.nio.file.Files
    val rows = Gen.listOfN(60, for {
      src <- Gen.oneOf("a", "b", "c")
      v   <- Gen.chooseNum(1L, 10000L)
    } yield (src, v)).sample.get.zipWithIndex
      .map { case ((src, v), i) => (i.toLong, src, v) }
    val tmp = Files.createTempDirectory("graft-qn-prop").toString
    rows.toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Stats.q153QuantileNorm(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Double]("qnorm")))
    val gMin = rows.map(_._3).min.toDouble
    val gMax = rows.map(_._3).max.toDouble
    out.foreach { case (_, _, _, q) => assert(q >= gMin && q <= gMax) }
    // monotone within each source: higher raw value -> >= normalized value
    out.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._1))
      sorted.sliding(2).foreach {
        case Array(lo, hi) => assert(lo._4 <= hi._4)
        case _ =>
      }
    }
  }

  test("property: the portable bin()-length rho (q242/q247) equals the JVM " +
    "leading-zeros intrinsic on random 60-bit hashes, in BOTH engines") {
    import spark.implicits._
    val hvs = Gen.listOfN(300, Gen.chooseNum(0L, (1L << 60) - 1)).sample.get
    // reference: tail = hv >> 6 has 54 bits; bit_length = 64 - nlz(tail);
    // rho = 55 - bit_length = nlz(tail) - 9 (tail != 0), else 55
    def refRho(hv: Long): Long = {
      val tail = hv >>> 6
      if (tail == 0L) 55L else java.lang.Long.numberOfLeadingZeros(tail) - 9L
    }
    val got = hvs.toDF("hv")
      .selectExpr("hv",
        "CASE WHEN shiftright(hv, 6) = 0 THEN 55L " +
          "ELSE 55L - length(bin(shiftright(hv, 6))) END AS rho")
      .as[(Long, Long)].collect().toMap
    hvs.foreach(hv => assert(got(hv) == refRho(hv), s"hv=$hv"))
  }
}

package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q108 entity pairs + q109 cohort retention + q110 attribution: the
  * wildcard-blocking completeness proof checked against brute force on
  * real data, plus hand-built timelines where the answers are computable
  * by hand.
  */
class EntityBehaviorSpec extends SparkSpec {

  test("q108: blocked pairs == brute-force pairs on the real sf0.001 customer table") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val blocked = Entity.q108EntityPairs(spark, dir)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val c = graft.sources.Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name")
    val brute = c.as("a").crossJoin(c.as("b"))
      .filter($"a.c_custkey" < $"b.c_custkey" &&
        length($"a.c_name") === length($"b.c_name") &&
        levenshtein($"a.c_name", $"b.c_name") <= 1)
      .select($"a.c_custkey", $"b.c_custkey").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)        // the check is vacuous on an empty set
    assert(blocked == brute)      // complete AND precise
  }

  test("q108: substitution pair found once; distance-2 and identical-name edges behave") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-er").toString
    Seq(
      (1L, "alpha"), (2L, "alphb"),  // dist 1 (substitution)
      (3L, "alpxy"),                 // dist 2 from both — excluded
      (4L, "gamma"), (5L, "gamma")   // identical: dist 0, must appear ONCE
    ).toDF("c_custkey", "c_name").write.mode("overwrite")
      .parquet(s"$tmp/customer.parquet")
    val rows = Entity.q108EntityPairs(spark, tmp).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1),
      r.getInt(r.fieldIndex("dist"))))
    assert(pairs.toSeq == Seq((1L, 2L, 1), (4L, 5L, 0)))
  }

  test("q218: survivorship merges exactly the paired customers, richest member wins") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Entity.q218Survivorship(spark, dir).collect()
    val pairs = Entity.q108EntityPairs(spark, dir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver union-find over the pair graph
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val clusters = (pairs.flatMap(p => Seq(p._1, p._2)).distinct)
      .groupBy(find).filter(_._2.length >= 2)
    assert(rows.length == clusters.size)
    val bal = graft.sources.Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_acctbal").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2)).toMap
    val byMembers = rows.map(r =>
      r.getAs[String]("member_keys") -> r).toMap
    clusters.values.foreach { ms =>
      val key = ms.sorted.mkString(",")
      val r = byMembers(key)
      assert(r.getAs[Long]("n_members") == ms.length)
      val best = ms.map(m => (bal(m), -m)).max
      assert(r.getAs[Long]("canonical_custkey") == -best._2)
      assert(r.getAs[Double]("canonical_acctbal") == best._1.toDouble)
    }
  }

  test("q217: credits conserve — channel credits sum to the attributed conversions") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Behavior.q217TimeDecayAttribution(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getAs[Float]("credit").toDouble).sum
    // per-conversion shares sum to 1, so total credit == #conversions
    // that had at least one in-window touch
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val attributed = (for {
      (u, pid, t, pus) <- ev if t == "purchase"
      if ev.exists { case (u2, _, t2, tus) =>
        u2 == u && (t2 == "click" || t2 == "view") &&
          tus < pus && pus - tus <= 86400000000L }
    } yield pid).distinct.size
    assert(math.abs(totalCredit - attributed) < 1e-3,
      s"credit $totalCredit vs attributed $attributed")
    assert(rows.map(_.getAs[Long]("n_conversions")).max <= attributed)
  }

  test("q209: LTV curve accumulates per cohort age on a multi-month timeline") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ltv").toString
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    // cohort Jan (users 1, 2): Jan revenue 10.00 + 20.00, Feb revenue 5.00
    // cohort Feb (user 3): Feb revenue 8.00; a click must not count
    Seq(
      (1L, ts("2024-01-05 10:00:00"), 1L, "purchase", 10.0, "{}"),
      (2L, ts("2024-01-20 10:00:00"), 2L, "purchase", 20.0, "{}"),
      (3L, ts("2024-02-10 10:00:00"), 1L, "purchase", 5.0, "{}"),
      (4L, ts("2024-02-12 10:00:00"), 3L, "purchase", 8.0, "{}"),
      (5L, ts("2024-02-13 10:00:00"), 3L, "click", 99.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.q209LtvCurve(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("rev_cents"),
         r.getAs[Long]("cum_rev_cents"), r.getAs[Double]("cum_rev_per_user"))).toMap
    val jan = 2024L * 12 + 1
    assert(got((jan, 0L)) == ((2L, 3000L, 3000L, 1500.0)))
    assert(got((jan, 1L)) == ((2L, 500L, 3500L, 1750.0)))
    assert(got((jan + 1, 0L)) == ((1L, 800L, 800L, 800.0)))
    assert(got.size == 3)
  }

  test("q109: two-cohort micro timeline produces the hand-computed matrix") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cohort").toString
    // Tables.load("events") expects nanos-long ts (the driver parquet shape)
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    // user 10: first week of 2024-01-01 (Mon), returns 2 weeks later
    // user 20: first week of 2024-01-08, returns the next week
    Seq(
      (1L, ts("2024-01-02 10:00:00"), 10L, "view", 0.0, "{}"),
      (2L, ts("2024-01-16 10:00:00"), 10L, "click", 0.0, "{}"),
      (3L, ts("2024-01-10 10:00:00"), 20L, "view", 0.0, "{}"),
      (4L, ts("2024-01-15 10:00:00"), 20L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.q109CohortRetention(spark, tmp).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("q119: length-3 paths count traversals and distinct users correctly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-paths").toString
    // user 1: a b c b c  -> paths: a>b>c, b>c>b, c>b>c
    // user 2: a b c      -> paths: a>b>c
    val rows =
      Seq("a", "b", "c", "b", "c").zipWithIndex.map { case (t, i) =>
        (1L, i.toLong, i.toLong, t) } ++
      Seq("a", "b", "c").zipWithIndex.map { case (t, i) =>
        (2L, i.toLong, (100 + i).toLong, t) }
    rows.map { case (u, ts, id, t) => (id, ts, u, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.q119EventPaths(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("a > b > c", 2L, 2L),   // both users traverse it
      ("b > c > b", 1L, 1L),
      ("c > b > c", 1L, 1L)))
  }

  test("q116: purchases see the dimension version valid at their instant") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-pit").toString
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "purchase", 0.0, "{}"),        // pre-history
      (2L, ts("2024-01-01 09:00:00"), 1L, "signup", 0.0, "{\"k\": 7}"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "purchase", 0.0, "{}"),        // seg 7
      (4L, ts("2024-01-01 11:00:00"), 1L, "signup", 0.0, "{\"k\": 9}"),
      (5L, ts("2024-01-01 11:00:00"), 1L, "purchase", 0.0, "{}"),        // same instant: new seg
      (6L, ts("2024-01-01 12:00:00"), 1L, "purchase", 0.0, "{}")         // seg 9
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val m = Behavior.q116PitJoin(spark, tmp).collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("segment")))).toMap
    assert(m == Map(1L -> None, 3L -> Some(7L), 5L -> Some(9L), 6L -> Some(9L)))
  }

  test("q110: last/first touch pick the right events; conversions without touches get nulls") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-attr").toString
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-01-01 12:00:00"), 1L, "purchase", 9.0, "{}"),
      (5L, ts("2024-01-01 13:00:00"), 1L, "click", 0.0, "{}"), // after: ignored
      (6L, ts("2024-01-01 08:00:00"), 2L, "purchase", 5.0, "{}") // no history
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = Behavior.q110Attribution(spark, tmp).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (Option(r.get(r.fieldIndex("last_click_id"))),
        Option(r.get(r.fieldIndex("first_touch_id"))))).toMap
    assert(byId(4L) == ((Some(3L), Some(1L)))) // latest click; earliest view
    assert(byId(6L) == ((None, None)))         // frame empty -> nulls
  }

  test("q159: growth accounting conserves users — day 1 is all-new, news sum to the user base") {
    import spark.implicits._
    val rows = Behavior.q159NewReturning(spark, "/root/testdata/sf0.001")
      .collect()
    val first = rows.head
    assert(first.getAs[Long]("n_active") == first.getAs[Long]("n_new"))
    val distinctUsers = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == distinctUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
    }
  }

  test("q241: a rigged one-arm day flags SRM; a balanced day does not") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-srm").toString
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    // mirror the query's arm hash to pick users by arm
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      if (java.lang.Long.parseLong(hex, 16) % 100 < 50) "A" else "B"
    }
    val usersA = (1L to 200L).filter(arm(_) == "A").take(20)
    val usersB = (1L to 200L).filter(arm(_) == "B").take(20)
    assert(usersA.size == 20 && usersB.size == 20)
    // day 1: balanced (20 A + 20 B); day 2: A only (logging loss in arm B)
    val day1 = (usersA ++ usersB).zipWithIndex.map { case (u, i) =>
      (i.toLong, ts("2024-03-01 10:00:00"), u, "view", 1.0, "{}") }
    val day2 = usersA.zipWithIndex.map { case (u, i) =>
      (1000L + i, ts("2024-03-02 10:00:00"), u, "view", 1.0, "{}") }
    (day1 ++ day2).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = Behavior.q241SrmCheck(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
         r.getAs[Float]("chi2"), r.getAs[Boolean]("srm_flag"))).toMap
    val (a1, b1, chi1, f1) = rows("2024-03-01")
    assert(a1 == 20L && b1 == 20L && chi1 == 0.0f && !f1)
    val (a2, b2, chi2v, f2) = rows("2024-03-02")
    assert(a2 == 20L && b2 == 0L && f2, s"chi2=$chi2v must flag")
    assert(math.abs(chi2v - 20.0) < 1e-5) // (20-10)^2/10 * 2
  }

  test("q243: the e-process accumulates across days and rejects an A-heavy " +
    "assignment drift exactly when exp(LLR) crosses 1/alpha") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sprt").toString
    def ts(s: String) = Timestamp.valueOf(s).getTime * 1000000L
    def arm(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      if (java.lang.Long.parseLong(hex, 16) % 100 < 50) "A" else "B"
    }
    val as = (1L to 400L).filter(arm(_) == "A").take(40)
    val bs = (1L to 400L).filter(arm(_) == "B").take(2)
    assert(as.size == 40 && bs.size == 2)
    val rows =
      (as.take(10) ++ bs).map(u => (u, ts("2024-03-01 10:00:00"), u, "view", 1.0, "{}")) ++
      as.slice(10, 25).map(u => (u + 10000L, ts("2024-03-02 10:00:00"), u, "view", 1.0, "{}")) ++
      as.slice(25, 40).map(u => (u + 20000L, ts("2024-03-03 10:00:00"), u, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Behavior.q243Sprt(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("cum_a"), r.getAs[Long]("cum_b"),
         r.getAs[Float]("e_value"), r.getAs[Boolean]("reject"))).toMap
    val d1 = out("2024-03-01"); val d3 = out("2024-03-03")
    assert(d1._1 == 10L && d1._2 == 2L)
    assert(d3._1 == 40L && d3._2 == 2L)
    // hand-computed LLR: 10·ln1.1 + 2·ln0.9 = 0.742 → e ≈ 2.1, no reject
    assert(!d1._4 && math.abs(d1._3 - math.exp(10 * math.log(1.1) + 2 * math.log(0.9))) < 1e-3)
    // 40·ln1.1 + 2·ln0.9 = 3.60 → e ≈ 36.7 ≥ 20: reject fires
    assert(d3._4 && math.abs(d3._3 - math.exp(40 * math.log(1.1) + 2 * math.log(0.9))) < 1e-2)
    // a user is counted once, on the first-seen day (cum telescopes)
    assert(out("2024-03-02")._1 == 25L)
  }

  test("q235: Bradley–Terry strengths satisfy the MLE fixpoint — expected wins " +
    "match actual wins; ranks are the strength permutation; masses conserve") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Behavior.q235BradleyTerry(spark, dir).collect()
    assert(rows.nonEmpty)
    val strength = rows.map(r =>
      r.getAs[String]("item") -> r.getAs[Float]("strength").toDouble).toMap
    // strengths are a normalized positive mass
    assert(strength.values.forall(_ > 0.0))
    assert(math.abs(strength.values.sum - 1.0) < 1e-5)
    // ranks are exactly the descending-strength permutation (ties by item)
    val expected = rows.sortBy(r =>
      (-r.getAs[Float]("strength").toDouble, r.getAs[String]("item")))
      .zipWithIndex.map { case (r, i) => r.getAs[String]("item") -> (i + 1L) }.toMap
    rows.foreach(r => assert(r.getAs[Long]("rank") ==
      expected(r.getAs[String]("item"))))
    // independent duel recount in plain Scala collections
    val perUser = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
      .groupBy(_._1).map { case (u, es) =>
        u -> es.groupBy(_._2).view.mapValues(_.size.toLong).toMap }
    val nij = scala.collection.mutable.Map.empty[(String, String), Long]
    val winsRef = scala.collection.mutable.Map.empty[String, Long]
    perUser.values.foreach { counts =>
      val ts = counts.keys.toSeq.sorted
      for (a <- ts; b <- ts if a < b && counts(a) != counts(b)) {
        val w = if (counts(a) > counts(b)) a else b
        winsRef(w) = winsRef.getOrElse(w, 0L) + 1
        nij((a, b)) = nij.getOrElse((a, b), 0L) + 1
        nij((b, a)) = nij.getOrElse((b, a), 0L) + 1
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("wins") == winsRef.getOrElse(r.getAs[String]("item"), 0L))
    }
    // at the MLE, E[wins_i] = Σ_j n_ij · π_i/(π_i+π_j) equals the actual
    // win count — 20 MM rounds must land within a relative percent
    strength.keys.foreach { i =>
      val ew = strength.keys.filter(j => j != i && nij.contains((i, j))).toSeq.sorted
        .map(j => nij((i, j)) * strength(i) / (strength(i) + strength(j))).sum
      val w = winsRef.getOrElse(i, 0L).toDouble
      assert(math.abs(ew - w) / math.max(w, 1.0) < 0.01,
        s"item $i expected-wins $ew vs actual $w")
    }
  }
}

package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Cavnar–Trenkle language ID (q252 profiles, q253 held-out confusion).
  *
  * The synthetic documents corpus carries NO language signal (its
  * word×lang contingency is independent — χ² ≈ 130 on 120 dof at
  * sf0.1, p ≈ 0.24, measured offline), so q253's matrix on the real
  * corpus is honestly ~chance. This spec proves the IMPLEMENTATION is
  * discriminative and exact: on a micro corpus with real per-language
  * character distributions the pipeline (a) reproduces an independent
  * plain-Scala Cavnar–Trenkle reference gram-for-gram and doc-for-doc,
  * and (b) is diagonal-dominant per label — which the q32 marker
  * heuristic is not even here.
  */
class CtLangIdSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private val K = 160

  // ---- independent plain-Scala Cavnar–Trenkle reference ----

  /** Same md5 train/eval bucket the queries derive in-engine. */
  private def bucket(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ct:$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
  }

  private def grams(word: String): Seq[String] = {
    val p = "_" + word + "_"
    (2 to math.min(4, p.length)).flatMap(l => p.sliding(l).toSeq)
  }

  private def rankProfile(counts: Map[String, Long]): Seq[(String, Long, Long)] =
    counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(K)
      .zipWithIndex.map { case ((g, c), i) => (g, i + 1L, c) }

  private def gramCounts(ws: Seq[String]): Map[String, Long] =
    ws.filter(_.matches("^[a-z]+$")).flatMap(grams)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refOutOfPlace(doc: Map[String, Long],
      lang: Map[String, Long]): Long =
    doc.map { case (g, dr) => lang.get(g).map(lr => math.abs(dr - lr))
      .getOrElse(K.toLong) }.sum

  // ---- fixture: three synthetic "languages" with REAL char signal ----

  private val vocab = Map(
    "aa" -> Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dogs", "run", "with", "speed", "and", "grace", "today"),
    "bb" -> Seq("der", "schnelle", "braune", "fuchs", "springt", "ueber",
      "faule", "hunde", "laufen", "schnell", "und", "heute", "gerne"),
    "cc" -> Seq("le", "renard", "brun", "rapide", "saute", "sur", "les",
      "chiens", "paresseux", "courent", "vite", "avec", "grace"))

  private lazy val fixtureRows: Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(42)
    vocab.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((lang, ws), li) =>
        (0 until 25).map { i =>
          val n = 12 + rnd.nextInt(10)
          val text = Seq.fill(n)(ws(rnd.nextInt(ws.size))).mkString(" ")
          ((li * 100 + i).toLong, lang, text)
        }
    }
  }

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ct").toString
    fixtureRows.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private lazy val refProfiles: Map[String, Seq[(String, Long, Long)]] = {
    val train = fixtureRows.filter(r => bucket(r._1) < 80)
    train.groupBy(_._2).view.mapValues { docs =>
      rankProfile(docs.map(_._3.split(" ").toSeq).map(gramCounts)
        .foldLeft(Map.empty[String, Long]) { (a, m) =>
          m.foldLeft(a) { case (acc, (g, c)) =>
            acc.updated(g, acc.getOrElse(g, 0L) + c) } })
    }.toMap
  }

  test("q252 profiles match the independent reference gram-for-gram " +
    "(rank, gram, count) on the signal micro corpus") {
    val got = TextOps.q252CtProfiles(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = refProfiles.toSeq.sortBy(_._1).flatMap { case (lang, prof) =>
      prof.map { case (g, rank, c) => (lang, rank, g, c) }
    }
    assert(got == want)
  }

  test("q253 held-out classification matches the reference doc-for-doc and " +
    "is diagonal-dominant per label — real signal IS recovered") {
    val evalDocs = fixtureRows.filter(r => bucket(r._1) >= 80)
    assert(evalDocs.map(_._2).distinct.size == vocab.size,
      "fixture must hold out at least one doc per language")
    val langProfMaps = refProfiles.view.mapValues(
      _.map { case (g, rank, _) => g -> rank }.toMap).toMap
    val refCells = evalDocs.map { case (_, label, text) =>
      val docProf = rankProfile(gramCounts(text.split(" ").toSeq))
        .map { case (g, rank, _) => g -> rank }.toMap
      val detected = langProfMaps.toSeq.map { case (lang, lp) =>
        (refOutOfPlace(docProf, lp), lang) }.min._2
      (label, detected)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextOps.q253CtConfusion(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == refCells)
    // diagonal dominance: every label's diagonal share is its row max
    vocab.keys.foreach { lang =>
      val diag = got.getOrElse((lang, lang), 0L)
      val offMax = got.collect {
        case ((l, d), n) if l == lang && d != lang => n }.maxOption.getOrElse(0L)
      assert(diag > offMax,
        s"label $lang not diagonal-dominant: diag $diag vs off-max $offMax")
    }
  }

  test("real-corpus law: cells partition the held-out docs and accuracy " +
    "is the diagonal mass (the honest ~chance grade is documented)") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.q253CtConfusion(spark, dir).collect()
    val n = rows.map(_.getLong(2)).sum
    val evalN = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).collect()
      .count(r => bucket(r.getLong(0)) >= 80)
    assert(n == evalN, s"matrix covers $n docs, held-out split has $evalN")
    val acc = rows.head.getFloat(4)
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(math.abs(acc - diag.toDouble / n) < 1e-6f)
  }

  test("native ctGramFrame emits exactly the reference gram multiset, " +
    "including 1-char words (char_ngrams short-string guard)") {
    import spark.implicits._
    // 1-char words ("a", "i") pad to length 3: order-4 grams must NOT
    // be emitted for them (the old nested-transform spelling capped the
    // order at len(padded); char_ngrams' short-string convention would
    // emit the whole string once — the `when` guard must suppress it)
    val texts = Seq((1L, "a tiny fox i saw"), (2L, "i a ab abc abcd ab a"))
    val tmp = Files.createTempDirectory("graft-ct-native").toString
    texts.map { case (id, t) => (id, "aa", t) }
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.ctGramFrame(spark, tmp)
      .groupBy($"doc_id", $"g")
      .agg(org.apache.spark.sql.functions.sum($"c").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = texts
      .flatMap { case (id, text) =>
        text.split(" ").filter(_.matches("^[a-z]+$"))
          .flatMap(grams).map(g => (id, g))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.SparkSpec

/** Native sketch-signature expressions (minhash_signature / simhash64 /
  * slot_agreement): codegen path vs a plain-Scala reference model, plus
  * null/edge behavior. The recall envelope of the signatures inside the
  * LSH pipelines is covered by the q40==q41==q42 oracle equality in
  * AllQueriesSpec/the driver gate.
  */
class SketchSignaturesSpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); GraftExtensions.register(spark) }

  private def refMinhash(sh: Seq[Long]): Seq[Long] =
    (0 until 64).map { k =>
      val seed = SketchHash.seed(k)
      if (sh.isEmpty) Long.MaxValue
      else sh.map(g => SketchHash.fmix64(g ^ seed)).min
    }

  private def refSimhash(sh: Seq[Long]): Long =
    (0 until 64).map { k =>
      val votes = sh.map(g => if (((g >>> k) & 1L) == 1L) 1 else -1).sum
      if (votes > 0) 1L << k else 0L
    }.foldLeft(0L)(_ | _)

  test("minhash_signature matches the reference model through codegen") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id",
        "array_distinct(transform(split(text, ' '), w -> xxhash64(w))) AS sh")
      .limit(50)
    val got = docs.selectExpr("doc_id", "sh", "minhash_signature(sh) AS sig")
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, sh, sig) =>
      assert(sig == refMinhash(sh), s"doc $id")
    }
  }

  test("simhash64 matches the reference model and the per-bit majority definition") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id",
        "array_distinct(transform(split(text, ' '), w -> xxhash64(w))) AS sh")
      .limit(50)
    val got = docs.selectExpr("doc_id", "sh", "simhash64(sh) AS sim")
      .as[(Long, Seq[Long], Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, sh, sim) =>
      assert(sim == refSimhash(sh), s"doc $id")
    }
  }

  test("slot_agreement counts aligned equal slots") {
    val r = spark.sql(
      """SELECT
        |  slot_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS two,
        |  slot_agreement(array(1L, 2L), array(1L, 2L)) AS all_eq,
        |  slot_agreement(array(1L), array(2L)) AS none,
        |  slot_agreement(CAST(NULL AS array<bigint>), array(1L)) AS nul
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 0)
    assert(r.isNullAt(3))
  }

  test("word_shingle_hashes == the declarative split/slice/xxhash64 chain, as a set") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val declarative = docs.select($"doc_id",
      array_sort(array_distinct(transform(
        graft.queries.TextOps.shingles($"text"), g => xxhash64(g)))).as("sh"))
    val native = docs.selectExpr("doc_id", "word_shingle_hashes(text) AS sh")
    val diff = native.as("a").join(declarative.as("b"), "doc_id")
      .filter($"a.sh" =!= $"b.sh").count()
    assert(diff == 0)
  }

  test("word_shingle_hashes edge cases: short docs, consecutive/trailing spaces, empty") {
    val rows = spark.sql(
      """SELECT word_shingle_hashes('one two') AS short,
        |       word_shingle_hashes('a  b c d') AS multi,
        |       word_shingle_hashes('a b c ') AS trail,
        |       word_shingle_hashes('') AS empty,
        |       xxhash64('one two') AS whole,
        |       xxhash64('') AS emptyhash
        |""".stripMargin).collect()(0)
    // < n words: one whole-doc shingle, hashed exactly like xxhash64(text)
    assert(rows.getSeq[Long](0) == Seq(rows.getLong(4)))
    // 'a  b c d' splits to [a, '', b, c, d]: five words, three 3-shingles
    assert(rows.getSeq[Long](1).length == 3)
    assert(rows.getSeq[Long](3) == Seq(rows.getLong(5)))
    // trailing space adds an empty word: 'a b c ' has 4 words, 2 shingles
    assert(rows.getSeq[Long](2).length == 2)
  }

  test("empty shingle set: deterministic MAX_VALUE signature, zero simhash") {
    val r = spark.sql(
      """SELECT minhash_signature(CAST(array() AS array<bigint>)) AS sig,
        |       simhash64(CAST(array() AS array<bigint>)) AS sim
        |FROM (SELECT 1)""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0).forall(_ == Long.MaxValue))
    assert(r.getLong(1) == 0L)
  }

  /** Independent reimplementation of srp_bucket's Rademacher plane stream
    * — pins the generated hyperplanes so a silent change to the mask
    * derivation (which would invalidate every persisted LSH bucket) fails
    * loudly, same discipline as the Fnv1a32 balancer pin.
    */
  private def refSrp(v: Seq[Float], nBits: Int, table: Int): Int = {
    val words = 1024 / 64
    (0 until nBits).foldLeft(0) { (acc, j) =>
      val dot = v.indices.foldLeft(0.0) { (d0, d) =>
        val mask = SketchHash.fmix64(
          SketchHash.seed(((table * 1024) + j) * words + (d >> 6)) ^ 0x5851F42D4C957F2DL)
        d0 + (if (((mask >>> (d & 63)) & 1L) == 1L) v(d).toDouble else -v(d).toDouble)
      }
      if (dot > 0.0) acc | (1 << j) else acc
    }
  }

  test("srp_bucket matches the reference model through codegen on real embeddings") {
    import spark.implicits._
    val got = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("embedding", "srp_bucket(embedding, 6, 0) AS b0",
        "srp_bucket(embedding, 6, 1) AS b1")
      .as[(Seq[Float], Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (v, b0, b1) =>
      assert(b0 == refSrp(v, 6, 0) && b1 == refSrp(v, 6, 1))
      assert(b0 >= 0 && b0 < 64 && b1 >= 0 && b1 < 64)
    }
    // the two tables must be independent hash families, not copies
    assert(got.exists { case (_, b0, b1) => b0 != b1 })
  }

  test("min_shingle_md5 == the declarative explode + md5 + groupBy-min formulation") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = docs
      .selectExpr("doc_id", "min_shingle_md5(text) AS fp")
      .selectExpr("doc_id", "fp.min_shingle_fp", "fp.n_shingles")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val want = docs
      .selectExpr("doc_id",
        """explode(array_distinct(transform(
          |  sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 3))))) AS g""".stripMargin)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.min(md5($"g".cast("binary"))).as("m"),
        count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("min_shingle_md5 edge cases: short docs and the empty string") {
    val r = spark.sql(
      """SELECT min_shingle_md5('one two') AS s2, min_shingle_md5('') AS s0
        |FROM (SELECT 1)""".stripMargin).collect()(0)
    val s2 = r.getStruct(0); val s0 = r.getStruct(1)
    // < n words: one whole-doc shingle
    assert(s2.getLong(1) == 1L && s0.getLong(1) == 1L)
    assert(s2.getString(0) == org.apache.commons.codec.digest.DigestUtils.md5Hex("one two"))
    assert(s0.getString(0) == org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
  }

  test("srp_bucket of a zero/empty vector is bucket 0 (ties clear every bit)") {
    val r = spark.sql(
      """SELECT srp_bucket(CAST(array() AS array<float>), 6, 0) AS be,
        |       srp_bucket(CAST(array(0.0, 0.0) AS array<float>), 6, 0) AS bz
        |FROM (SELECT 1)""".stripMargin).collect()(0)
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }
}

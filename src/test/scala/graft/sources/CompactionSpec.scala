package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Compaction: fewer files, identical data, partition structure intact. */
class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) Seq(f) else Nil }
      else Option(f.listFiles()).toSeq.flatten
        .filterNot(c => c.getName.startsWith(".") || c.getName.startsWith("_"))
        .flatMap(walk)
    walk(new java.io.File(dir))
  }

  test("fragmented partitioned table packs to one file per partition, data identical") {
    val out = Files.createTempDirectory("graft-compact").toString
    val df = (1 to 4000).map(i => (i.toLong, i % 4, s"payload_$i")).toDF("id", "p", "v")
    // fragment: 8 writer tasks per partition value ⇒ ~32 small files
    df.repartition(8).write.partitionBy("p").mode("overwrite").parquet(out)
    val before = parquetFiles(out)
    assert(before.length >= 16, s"setup should fragment, got ${before.length} files")
    val stats = Compaction.compact(spark, out, targetBytes = 512L << 20)
    assert(stats.partitionsCompacted == 4)
    assert(stats.filesBefore == before.length)
    val after = parquetFiles(out)
    assert(after.length == 4, s"expected 1 file per partition, got ${after.length}")
    // identical data, partition column preserved from directory layout
    // (read-back appends the partition column last — align by name)
    val back = spark.read.parquet(out).select("id", "p", "v")
    assert(back.count() == 4000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // partition pruning still works on the compacted layout
    assert(back.filter(col("p") === 2).count() === 1000)
  }

  test("targetBytes bounds output file count instead of always producing one file") {
    val out = Files.createTempDirectory("graft-compact2").toString
    (1 to 20000).map(i => (i.toLong, "x" * 200)).toDF("id", "v")
      .repartition(16).write.mode("overwrite").parquet(out)
    val totalBytes = parquetFiles(out).map(_.length()).sum
    val target = totalBytes / 3 // should pack 16 → ceil(total/(total/3)) = 3..4 files
    val stats = Compaction.compact(spark, out, targetBytes = target)
    val got = parquetFiles(out).length
    assert(stats.partitionsCompacted == 1)
    assert(got >= 3 && got <= 4, s"expected 3-4 files, got $got")
    assert(spark.read.parquet(out).count() == 20000)
  }

  test("already-compact partitions are left untouched (no rewrite, same files)") {
    val out = Files.createTempDirectory("graft-compact3").toString
    (1 to 100).map(i => (i.toLong, i % 2)).toDF("id", "p")
      .coalesce(1).write.partitionBy("p").mode("overwrite").parquet(out)
    val before = parquetFiles(out).map(f => f.getPath -> f.lastModified()).toMap
    val stats = Compaction.compact(spark, out)
    assert(stats.partitionsCompacted == 0 && stats.bytesRewritten == 0)
    val after = parquetFiles(out).map(f => f.getPath -> f.lastModified()).toMap
    assert(after == before)
  }

  test("compacting an accreted IVF index keeps probes correct") {
    import graft.queries.Similarity
    val dir = "/root/testdata/sf0.001"
    val indexPath = Files.createTempDirectory("graft-compact-ivf").toString
    Similarity.writeIvfIndex(spark, dir, indexPath, nCentroids = 4)
    val e = Tables.load(spark, dir, "embeddings")
    // accrete: several small appends fragment the cell partitions
    (0 until 3).foreach { i =>
      Similarity.appendToIvfIndex(spark, indexPath,
        e.filter($"vec_id" % 3 === i).selectExpr("vec_id + 10000 AS vec_id", "embedding"))
    }
    val cells = s"$indexPath/cells"
    val before = parquetFiles(cells).length
    val countBefore = spark.read.parquet(cells).count()
    val stats = Compaction.compact(spark, cells, targetBytes = 512L << 20)
    assert(stats.partitionsCompacted > 0)
    assert(parquetFiles(cells).length < before)
    assert(spark.read.parquet(cells).count() == countBefore)
    // the bucket=cid partition column survives for partition-pruned probes
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val res = Similarity.annIvfIndexed(spark, indexPath, q, nProbe = 4)
    assert(res.count() > 0)
  }
}

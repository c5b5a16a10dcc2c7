package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.Tables

/** Incremental IVF index maintenance: a streaming embedding source keeps
  * the persisted index fresh — new vectors land in their nearest frozen
  * cell's partition and become findable by the next probe, without an
  * index rebuild.
  */
class IvfMaintenanceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  case class VecRow(vec_id: Long, embedding: Array[Float])

  test("streamed vectors land in cell partitions and are found by the next probe") {
    val s = spark
    import s.implicits._
    val indexPath = Files.createTempDirectory("graft-ivf-maint").toString
    val ckpt = Files.createTempDirectory("graft-ivf-maint-ckpt").toString
    Similarity.writeIvfIndex(s, dir, indexPath, nCentroids = 8)

    // one query vector from the corpus
    val q = Tables.load(s, dir, "embeddings")
      .filter($"vec_id" === 100L)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val qe = q.collect()(0).getSeq[Float](1).toArray

    val before = Similarity.annIvfIndexed(s, indexPath, q, nProbe = 2)
      .collect().map(_.getLong(2)) // nid column
    assert(!before.contains(900001L))

    // stream in two new vectors: an exact duplicate of the query vector
    // (must become its rank-1 neighbor) and an unrelated one
    val in = MemoryStream[VecRow](spark)
    val query = Similarity.streamIntoIvfIndex(s, indexPath, in.toDF(), ckpt)
    try {
      in.addData(VecRow(900001L, qe), VecRow(900002L, qe.map(v => -v)))
      query.processAllAvailable()
    } finally query.stop()

    val after = Similarity.annIvfIndexed(s, indexPath, q, nProbe = 2).collect()
    // the duplicate is rank 1 with cosine exactly 1.0
    assert(after(0).getLong(2) == 900001L, after.mkString("; "))
    assert(after(0).getDouble(3) == 1.0)

    // the cell layout is preserved: everything lives under cid= partitions
    val cells = new java.io.File(s"$indexPath/cells")
    val partDirs = cells.listFiles().filter(_.isDirectory).map(_.getName)
    assert(partDirs.nonEmpty && partDirs.forall(_.startsWith("cid=")))
    // and the duplicate sits in the SAME cell as its twin (frozen codebook)
    val cellOf = (id: Long) => s.read.parquet(s"$indexPath/cells")
      .filter($"vec_id" === id).select($"cid").collect()(0).getInt(0)
    assert(cellOf(900001L) == cellOf(100L))
  }
}

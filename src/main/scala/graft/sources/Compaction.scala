package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the maintenance
  * half of every streaming sink at scale: per-micro-batch writers
  * (parquet sink, Materialize's bucket rewrites, appendToIvfIndex's cell
  * appends) accrete files a few MB each, and at 100 TB a scan's task
  * count and footer-read overhead are dominated by file COUNT, not data
  * size. Compaction bin-packs each leaf partition back to
  * ~`targetBytes` files.
  *
  * Scale shape: each leaf partition compacts independently (the loop
  * parallelizes trivially across a driver pool if needed), reads only
  * partitions that are actually fragmented, and `coalesce` keeps the
  * rewrite shuffle-free — a compaction pass over a bucketed table moves
  * each fragmented bucket's bytes exactly once.
  *
  * Swap discipline: new files are written to a hidden temp dir under the
  * table root (invisible to concurrent parquet readers, which skip
  * dot/underscore paths), then swapped in with per-file renames. Without
  * a table-format commit log the swap is not atomic under a mid-swap
  * crash — production table formats (Iceberg/Delta/Hudi) exist to close
  * exactly that window; rerunning compaction heals a torn swap since
  * source data is re-derivable from the remaining files only if the
  * delete phase hasn't begun, so the temp dir is only cleared AFTER all
  * its files moved.
  *
  * Do NOT point this at a streaming file-sink directory that readers
  * consume through its `_spark_metadata` log: the log pins the original
  * file names. (Materialize replicas and IVF cell dirs are plain
  * directories — safe.)
  */
object Compaction {

  final case class Stats(
      partitionsCompacted: Int, filesBefore: Int, filesAfter: Int, bytesRewritten: Long)

  /** Compact every leaf partition of `root` whose parquet files could
    * pack into fewer than their current count at `targetBytes` per file.
    */
  def compact(s: SparkSession, root: String, targetBytes: Long = 128L << 20,
      minFiles: Int = 2): Stats = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val leaves = leafDirs(fs, rootPath)
    var parts = 0; var before = 0; var after = 0; var bytes = 0L
    leaves.foreach { leaf =>
      val files = fs.listStatus(leaf).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      val total = files.map(_.getLen).sum
      val numOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
      if (files.length >= minFiles && numOut < files.length) {
        val tmp = new Path(rootPath, s".compact_tmp_${System.nanoTime()}")
        s.read.parquet(leaf.toString)
          .coalesce(numOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val newFiles = fs.listStatus(tmp).filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        files.foreach(f => fs.delete(f.getPath, false))
        newFiles.foreach(f => fs.rename(f.getPath, new Path(leaf, f.getPath.getName)))
        fs.delete(tmp, true)
        parts += 1; before += files.length; after += newFiles.length; bytes += total
      }
    }
    Stats(parts, before, after, bytes)
  }

  /** Directories that directly contain parquet data files (partition
    * leaves, or the root itself for unpartitioned tables); hidden
    * (dot/underscore) paths are skipped the way Spark's file index does.
    */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    def visible(p: Path) = !p.getName.startsWith(".") && !p.getName.startsWith("_")
    val entries = fs.listStatus(root).filter(e => visible(e.getPath))
    val here =
      if (entries.exists(e => e.isFile && e.getPath.getName.endsWith(".parquet"))) Seq(root)
      else Seq.empty
    here ++ entries.filter(_.isDirectory).flatMap(d => leafDirs(fs, d.getPath))
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrder

/** Z-order layout: the interleaving is a bijection on the 16-bit grid,
  * and sorting by it actually buys two-dimensional file locality — the
  * property the layout pass exists for.
  */
class LayoutSpec extends SparkSpec {

  test("zValue is a bijection on the 16-bit grid and orders by bit-interleave") {
    import spark.implicits._
    val n = 64
    val grid = spark.range(n * n)
      .select(($"id" % n).as("x"), ($"id" / n).cast("long").as("y"))
      .select($"x", $"y", ZOrder.zValue($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(grid.map(_._3).distinct.length == n * n) // injective on the grid
    // spot-check the classic Morton values
    val at = grid.map { case (x, y, z) => (x, y) -> z }.toMap
    assert(at((0L, 0L)) == 0L && at((1L, 0L)) == 1L && at((0L, 1L)) == 2L &&
      at((1L, 1L)) == 3L && at((7L, 7L)) == 63L)
  }

  test("z-ordered layout yields far tighter per-file bounding boxes than arrival order") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey".cast("long").as("x"),
        datediff($"o_orderdate", lit(java.sql.Date.valueOf("1992-01-01")))
          .cast("long").as("y"))
    val base = Files.createTempDirectory("graft-layout").toString
    orders.repartition(8).write.parquet(s"$base/plain")
    Layout.zorderWrite(orders, $"x", $"y", s"$base/z", nFiles = 8)
    val plainArea = Layout.meanFileBoxArea(spark, s"$base/plain", "x", "y")
    val zArea     = Layout.meanFileBoxArea(spark, s"$base/z", "x", "y")
    // round-robin files each span ~the whole (x, y) domain; z-order files
    // cover small rectangles. 4× is a loose floor — measured ~8-30×.
    assert(zArea * 4 < plainArea, s"z=$zArea plain=$plainArea")
    // rows and values survive the rewrite
    val back = spark.read.parquet(s"$base/z")
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }
}

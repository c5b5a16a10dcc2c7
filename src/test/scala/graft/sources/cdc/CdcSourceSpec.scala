package graft.sources.cdc

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The custom DataSourceV2 CDC source: micro-batch semantics, LSN-ordered
  * offsets, and source-side op/table filter pushdown.
  */
class CdcSourceSpec extends SparkSpec {

  private def writeFile(dir: Path, name: String, events: Seq[(String, String, Int)]): Unit = {
    val lines = events.map { case (op, table, id) =>
      s"""{"eventTime":"2024-01-01T00:00:01.000Z","tableNamespace":"public","tableName":"$table","oldData":null,"newData":{"id":"$id"},"op":"$op"}"""
    }
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)
  }

  test("batch read returns all events with the ChangeEvent schema") {
    val dir = Files.createTempDirectory("cdc-src")
    writeFile(dir, "000001.json", Seq(("INSERT", "users", 1), ("UPDATE", "users", 2)))
    writeFile(dir, "000002.json", Seq(("DELETE", "orders", 3)))
    val df = spark.read.format("graft-cdc").option("path", dir.toString).load()
    assert(df.count() == 3)
    assert(df.schema == graft.model.ChangeEvent.schema)
    assert(df.filter("newData['id'] = '2'").count() == 1)
  }

  test("op and table filters push into the source scan") {
    val dir = Files.createTempDirectory("cdc-push")
    writeFile(dir, "000001.json",
      Seq(("INSERT", "users", 1), ("UPDATE", "users", 2), ("INSERT", "orders", 3)))
    val df = spark.read.format("graft-cdc").option("path", dir.toString).load()
      .filter("op = 'INSERT' AND tableName = 'users'")
    // pushdown visible in the scan description
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("pushed=[") && scan.contains("op"), scan)
    assert(df.count() == 1)
    assert(df.collect()(0).getAs[Map[String, String]]("newData")("id") == "1")
  }

  test("micro-batch stream consumes files in LSN order and tails new ones") {
    val dir = Files.createTempDirectory("cdc-stream")
    val name = s"cdc_${System.nanoTime()}"
    writeFile(dir, "000001.json", Seq(("INSERT", "users", 1)))
    val q = spark.readStream.format("graft-cdc").option("path", dir.toString).load()
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql(s"SELECT * FROM $name").count() == 1)
      writeFile(dir, "000002.json", Seq(("INSERT", "users", 2), ("DELETE", "users", 1)))
      q.processAllAvailable()
      val rows = spark.sql(s"SELECT op, newData['id'] AS id FROM $name ORDER BY id").collect()
      assert(rows.length == 3)
    } finally q.stop()
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Batch source/sink format coverage (SURVEY §2B scans/sinks row):
  * parquet is the primary lane (all oracle queries); CSV and JSON
  * round-trip the same tables with schema preserved.
  */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trip preserves rows and values (header + explicit schema)") {
    val nation = Tables.load(spark, dir, "nation")
    val out = Files.createTempDirectory("graft-csv").toString
    nation.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(nation.schema).option("header", "true").csv(out)
    assert(back.count() == nation.count())
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("JSON round-trip preserves rows and values") {
    val region = Tables.load(spark, dir, "region")
    val out = Files.createTempDirectory("graft-json").toString
    region.write.mode("overwrite").json(out)
    val back = spark.read.schema(region.schema).json(out)
    assert(back.exceptAll(region).isEmpty && region.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves rows and values") {
    val supplier = Tables.load(spark, dir, "supplier")
    val out = Files.createTempDirectory("graft-orc").toString
    supplier.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.exceptAll(supplier).isEmpty && supplier.exceptAll(back).isEmpty)
  }

  test("partitioned parquet write prunes partitions on read (scan pushdown)") {
    val customer = Tables.load(spark, dir, "customer")
    val out = Files.createTempDirectory("graft-part").toString
    customer.write.mode("overwrite").partitionBy("c_mktsegment").parquet(out)
    val one = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
    val plan = one.queryExecution.executedPlan.toString
    // partition filter must NOT appear as a data filter — pruning happened
    assert(one.count() == customer.filter("c_mktsegment = 'BUILDING'").count())
    assert(plan.contains("PartitionFilters") || !plan.contains("Filter"))
  }
}

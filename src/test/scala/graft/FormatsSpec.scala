package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format round-trips beyond parquet: ORC (the other columnar
  * lake format, with predicate pushdown asserted at the scan) and headered
  * CSV export/re-import (the reference's A12 export surface — values must
  * survive the text round-trip bit-exactly).
  */
class FormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val out = Files.createTempDirectory("graft-orc").toString
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("o_orderkey").collect().toSeq ===
      src.orderBy("o_orderkey").collect().toSeq)
    val filtered = back.filter(col("o_custkey") === 7L)
    val scan = filtered.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("o_custkey"),
      s"ORC scan did not push the filter: ${scan.metadata("PushedFilters")}")
    assert(filtered.count() === src.filter(col("o_custkey") === 7L).count())
  }

  test("headered CSV export round-trips values exactly") {
    val out = Files.createTempDirectory("graft-csv").toString
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))
    src.write.mode("overwrite").option("header", "true").csv(out)
    // explicit schema on re-import: export consumers declare types, they
    // don't infer them (inference samples data and can drift)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(back.orderBy("o_orderkey").collect().toSeq ===
      src.orderBy("o_orderkey").collect().toSeq)
  }
}

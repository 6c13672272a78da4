package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format round-trips beyond parquet: ORC (the other columnar
  * lake format, with predicate pushdown asserted at the scan), headered
  * CSV export/re-import (the reference's A12 export surface — values must
  * survive the text round-trip bit-exactly), and JSONL (the LLM-corpus
  * interchange format, with malformed-line quarantine mirroring the A4
  * dead-letter semantics).
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

  test("JSONL round-trips the documents corpus exactly (unicode, quotes, newlines-in-text)") {
    val out = Files.createTempDirectory("graft-jsonl").toString
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.orderBy("doc_id").collect().toSeq ===
      src.orderBy("doc_id").collect().toSeq)
  }

  test("JSONL malformed lines quarantine via PERMISSIVE corrupt-record, clean lines survive") {
    // the A4 dead-letter shape applied to the corpus interchange format:
    // a bad line must neither kill the read (FAILFAST) nor silently
    // vanish (DROPMALFORMED) — it lands in _corrupt_record with the raw
    // text preserved, exactly like the quarantine sink's row_data
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    Files.writeString(dir.resolve("part-000.jsonl"),
      """{"doc_id": 1, "text": "good one"}
        |{"doc_id": 2, "text": "unterminated
        |not json at all
        |{"doc_id": 3, "text": "another good", "extra_field": true}
        |{"doc_id": "not-a-number", "text": "type mismatch"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column requires a materialization boundary
    val good = read.filter(col("_corrupt_record").isNull)
    val bad = read.filter(col("_corrupt_record").isNotNull)
    // doc 3's unknown field is tolerated (schema projection, not rejection)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 3L))
    assert(bad.count() === 3) // unterminated, non-json, type-mismatch
    // the quarantine preserves the raw line for replay, A4-style
    assert(bad.filter(col("_corrupt_record").contains("not json at all")).count() === 1)
    read.unpersist()
  }
}

package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File+offset raw_data_id assignment (Ingest.stageObservations): SERIAL
  * load-order semantics with no global sort — ids are dense 1..N in file
  * order, duplicates survive with distinct ids, assignment is deterministic
  * across evaluations, and the plan contains no window at all.
  */
class IngestSpec extends SparkSpec {

  private def idsByAuthorDay(df: org.apache.spark.sql.DataFrame) =
    df.select(col("raw_data_id"), col("authors"), col("obs_date"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2))))

  test("single file: dense 1..N ids in file order; duplicates keep distinct ids") {
    val dir = Files.createTempDirectory("graft-ingest-1")
    val stg = Ingest.stageObservations(spark, DopiFixture.write(dir))
    val n = DopiFixture.rows.size
    val ids = stg.select("raw_data_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (1L to n.toLong))
    // rows 1 and 2 of the file are the full-duplicate pair → ids 1 and 2
    val contentCols = Schemas.obsStaging.map(col)
    val dupIds = stg.groupBy(contentCols: _*)
      .agg(collect_list(col("raw_data_id")).as("ids"))
      .filter(size(col("ids")) === 2)
      .select(explode(col("ids")))
      .collect().map(_.getLong(0)).toSet
    assert(dupIds === Set(1L, 2L))
    // file order: the no-author row is the 8th data row
    assert(stg.filter(col("authors") === "Nobody Nomatch")
      .select("raw_data_id").collect().map(_.getLong(0)).toSeq === Seq(8L))
  }

  test("multi-file load: per-file base offsets concatenate in file order") {
    val dir = Files.createTempDirectory("graft-ingest-2")
    val stg = Ingest.stageObservations(spark, DopiFixture.writeSplit(dir, 2))
    val n = DopiFixture.rows.size
    val ids = stg.select("raw_data_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (1L to n.toLong))
    // second file starts at row 8 (7 rows per file) → its first row, the
    // no-author row, must get id 8
    assert(stg.filter(col("authors") === "Nobody Nomatch")
      .select("raw_data_id").collect().map(_.getLong(0)).toSeq === Seq(8L))
  }

  test("assignment is deterministic across independent evaluations") {
    val dir = Files.createTempDirectory("graft-ingest-3")
    val path = DopiFixture.writeSplit(dir, 3)
    val a = idsByAuthorDay(Ingest.stageObservations(spark, path)).sortBy(_._1)
    val b = idsByAuthorDay(Ingest.stageObservations(spark, path)).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("no window (and so no single-partition sort) in the staging plan") {
    val dir = Files.createTempDirectory("graft-ingest-4")
    val stg = Ingest.stageObservations(spark, DopiFixture.write(dir))
    val windows = stg.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty)
  }
}

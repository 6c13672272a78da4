package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Properties of the OLAP reshaping operators (the oracle hash-checks the
  * values; these pin the structural contracts at a different SF).
  */
class OlapOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("gap fill: dense grid, conserved counts, real gaps zero-filled") {
    val out = OlapOps.gapFill(spark, sf).cache()
    // every type covers the identical full hour span (dense axis)
    val spans = out.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"),
      min("hour_start").as("h0"), max("hour_start").as("h1"))
    assert(spans.select("n_hours", "h0", "h1").distinct().count() === 1)
    // zero-filling adds rows, never counts: totals match the raw table
    val total = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    // the fixture actually has gaps — otherwise the op is untested
    assert(out.filter(col("n_events") === 0).count() > 0)
    out.unpersist()
  }
}

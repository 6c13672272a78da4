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

  test("skyline: dominance with ties, across the band boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sky").toString
    Seq(
      (8.00, 2),            // frontier: nothing cheaper
      (9.00, 5), (9.00, 3), // 5 is the price group's best; 3 dominated in-group
      (10.00, 7), (10.00, 7), // frontier point with population 2
      (11.00, 6),           // dominated: (10.00, 7) is cheaper and bigger
      (12.00, 7))           // dominated: equal size at a HIGHER price
      .toDF("p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // prices span two 1000-cent bands (800/900 vs 1000/1100/1200), so the
    // cross-band offset probe is exercised, not just the in-band window
    val rows = OlapOps.skyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((800L, 2L, 1L), (900L, 5L, 1L), (1000L, 7L, 2L)))
  }

  test("drillAcross: fact-only months keep NULL measures, shared months merge") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-drill").toString
    Seq(
      (Timestamp.valueOf("1995-01-03 00:00:00"), 10.00),
      (Timestamp.valueOf("1995-01-20 00:00:00"), 20.00),
      (Timestamp.valueOf("2024-01-07 00:00:00"), 5.00))
      .toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (Timestamp.valueOf("2024-01-05 00:00:00"), 1.00),
      (Timestamp.valueOf("2024-01-06 00:00:00"), 2.00))
      .toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = OlapOps.drillAcross(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getLong(3), Option(r.get(4))))).toMap
    // orders-only month: activity measures NULL, count 0
    assert(got(199501L) === ((2L, Some(3000L), 0L, None)))
    // shared month: both facts contribute at their own grain
    assert(got(202401L) === ((1L, Some(500L), 2L, Some(300L))))
    assert(got.size === 2)
  }
}

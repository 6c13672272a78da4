package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The two documented 100 TB approximation escape hatches (SCALE.md,
  * "real cluster" #4) exercised in-engine: they are not oracle entries
  * (approximation cannot hash-match an exact oracle — that is the point of
  * the exact/approx split), so this spec is what proves the approximate
  * forms are wired, mergeable, and inside tolerance of the exact answers
  * they would replace.
  */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within rsd of the exact multi-distinct") {
    val exact = Tables.lineitem(spark, sf)
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .head().getLong(0)
    val approx = Tables.lineitem(spark, sf)
      .agg(approx_count_distinct(col("l_suppkey"), 0.02).as("n"))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"HLL err $err (exact=$exact approx=$approx) outside 3x rsd")
  }

  test("approx_percentile lands within 1% relative accuracy of exact percentile") {
    val row = Tables.orders(spark, sf)
      .agg(
        percentile(col("o_totalprice").cast("double"), lit(0.5)).as("exact_p50"),
        percentile_approx(col("o_totalprice").cast("double"), lit(0.5), lit(10000))
          .as("approx_p50"))
      .head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01,
      s"t-digest p50 $approx vs exact $exact drifted > 1%")
  }
}

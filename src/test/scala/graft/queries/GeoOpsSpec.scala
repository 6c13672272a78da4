package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the grid-bucketed spatial radius join: the grid candidate
  * cover must be COMPLETE (equal to the quadratic brute force, boundary
  * included) and never double-count — the exactness claim the 3×3 fan-out
  * makes by the cell-edge-equals-radius pigeonhole.
  */
class GeoOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("geo neighbors: grid join equals the quadratic brute force") {
    val out = GeoOps.geoNeighbors(spark, sf).cache()
    // brute force over the same md5-derived points (150 points at sf0.001
    // — the cross join is test-only truth, exactly what the grid must
    // replace at scale)
    val pts = out.select(col("custkey"), col("x"), col("y")).cache()
    val r2 = GeoOps.GeoRadius * GeoOps.GeoRadius
    val brute = pts.select(col("custkey").as("ka"), col("x").as("xa"), col("y").as("ya"))
      .crossJoin(pts.select(col("custkey").as("kb"), col("x").as("xb"), col("y").as("yb")))
      .filter(col("ka") =!= col("kb") &&
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) <= r2)
      .withColumn("dist_sq",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .groupBy(col("ka").as("custkey"))
      .agg(count(lit(1)).as("bn"), min(col("dist_sq")).as("bd"))
    val joined = out.join(brute, Seq("custkey"), "left")
    assert(joined.filter(
      coalesce(col("bn"), lit(0L)) =!= col("n_neighbors") ||
        (col("bd").isNotNull && col("bd") =!= col("nn_dist_sq")) ||
        (col("bd").isNull && col("nn_dist_sq").isNotNull)).count() === 0)
    out.unpersist(); pts.unpersist()
  }

  test("geo neighbors: census is total and isolated points carry nulls") {
    val out = GeoOps.geoNeighbors(spark, sf).cache()
    assert(out.count() === graft.Tables.customer(spark, sf).count())
    // nn_dist_sq present iff a neighbor exists, and then within the radius
    assert(out.filter(col("n_neighbors") === 0 && col("nn_dist_sq").isNotNull)
      .count() === 0)
    assert(out.filter(col("n_neighbors") > 0 && (col("nn_dist_sq").isNull ||
      col("nn_dist_sq") > GeoOps.GeoRadius * GeoOps.GeoRadius)).count() === 0)
    // neighborhood is symmetric: total directed degree is even
    val deg = out.agg(sum(col("n_neighbors"))).head().getLong(0)
    assert(deg % 2 === 0)
    out.unpersist()
  }

  test("geo density: totals, window clipping, and hotspot law") {
    val out = GeoOps.geoDensity(spark, sf).collect()
    assert(out.nonEmpty)
    val nPts = graft.Tables.customer(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum === nPts)
    val axis = GeoOps.GeoSpan / GeoOps.GeoRadius
    out.foreach { r =>
      val (cx, cy, n, sm, w) = (r.getAs[Long]("cx"), r.getAs[Long]("cy"),
        r.getAs[Long]("n"), r.getAs[Long]("smoothed"), r.getAs[Long]("n_window"))
      assert(cx >= 0 && cx < axis && cy >= 0 && cy < axis)
      assert(sm >= n) // the window always contains the cell itself
      // clipped kernel size is positional: 4 corners, 6 edges, 9 interior
      val wx = math.min(cx + 1, axis - 1) - math.max(cx - 1, 0) + 1
      val wy = math.min(cy + 1, axis - 1) - math.max(cy - 1, 0) + 1
      assert(w === wx * wy && Set(4L, 6L, 9L).contains(w))
      // the flag is exactly the documented cross-multiplied inequality
      val hot = sm * axis * axis * GeoOps.GeoHotDen >
        nPts * w * GeoOps.GeoHotNum
      assert(r.getAs[Int]("is_hot") === (if (hot) 1 else 0))
    }
  }
}

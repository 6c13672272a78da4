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

  test("geo latlon: grid join equals the quadratic brute force") {
    val out = GeoOps.geoLatLon(spark, sf).cache()
    val pts = out.select(col("custkey"), col("latu"), col("lonu")).cache()
    val s = GeoOps.GeoCosScale
    val r2 = GeoOps.GeoLLRadius * GeoOps.GeoLLRadius
    val cosArr = array(GeoOps.GeoCosQ.map(lit): _*)
    val brute = pts
      .select(col("custkey").as("ka"), col("latu").as("lata"), col("lonu").as("lona"))
      .crossJoin(pts.select(col("custkey").as("kb"), col("latu").as("latb"),
        col("lonu").as("lonb")))
      .filter(col("ka") =!= col("kb"))
      .withColumn("cosq", cosArr)
      .withColumn("band", expr("(lata + latb) div 2 div 1000000"))
      .withColumn("qlon",
        expr(s"(abs(lona - lonb) * element_at(cosq, cast(band as int) + 1)) div $s"))
      .withColumn("d2",
        (col("lata") - col("latb")) * (col("lata") - col("latb"))
          + col("qlon") * col("qlon"))
      .filter(col("d2") <= lit(r2))
      .groupBy(col("ka").as("custkey"))
      .agg(count(lit(1)).as("bn"), min(col("d2")).as("bd"))
    val joined = out.join(brute, Seq("custkey"), "left")
    assert(joined.filter(
      coalesce(col("bn"), lit(0L)) =!= col("n_neighbors") ||
        (col("bd").isNotNull && col("bd") =!= col("nn_dist2")) ||
        (col("bd").isNull && col("nn_dist2").isNotNull)).count() === 0)
    out.unpersist(); pts.unpersist()
  }

  test("geo latlon: boundary pairs at the cell edge are found exactly") {
    import spark.implicits._
    val r = GeoOps.GeoLLRadius
    // band 60 (equatorial center 0.5 deg): cosq/2^20 ~ 0.99996 — a pure-
    // latitude pair exactly r apart sits ON the radius AND spans a lat
    // cell boundary; one microdegree more falls outside. A pure-longitude
    // pair at high latitude (band 119, cos ~ 0.5075) shows the degree
    // scaling: lon gap r/0.5075 ~ 1.97r crosses a lon cell edge (width
    // 2r) yet is an in-radius TRUE neighbor the cover must find.
    val latEq = 60000000L // 0 deg true latitude, exactly a cell boundary
    val latHi = 119000000L // 59-60 deg band
    val cosHi = GeoOps.GeoCosQ(119)
    // largest lon gap still inside the radius at band 119
    val lonGap = ((r + 1) * GeoOps.GeoCosScale - 1) / cosHi
    val pts = Seq(
      (1L, latEq - 1L, 1000L),  // A: one microdeg below the lat cell edge
      (2L, latEq - 1L + r, 1000L), // B: exactly r above A (adjacent cell)
      (3L, latEq - 1L + r + 1L, 1000L), // F: r+1 above A — just outside
      (4L, latHi, 10000000L),   // C
      (5L, latHi, 10000000L + lonGap), // D: max in-radius lon gap from C
      (6L, latHi, 10000000L + lonGap + lonGap) // E: out of radius from C
    ).toDF("k", "latu", "lonu")
    val out = GeoOps.geoLatLonFrom(pts).collect()
      .map(row => row.getAs[Long]("custkey") ->
        (row.getAs[Long]("n_neighbors"), Option(row.getAs[Any]("nn_dist2"))))
      .toMap
    assert(out(1L)._1 === 1L && out(1L)._2.contains(r * r)) // A-B on the edge
    assert(out(2L)._1 === 2L && out(2L)._2.contains(1L)) // B: A at r, F at 1
    assert(out(3L)._1 === 1L && out(3L)._2.contains(1L)) // F: only B (A is r+1)
    // C-D inside (the scaled lon distance floors to <= r), D-E inside too
    // (same gap), C-E outside (double gap)
    val qGap = lonGap * cosHi / GeoOps.GeoCosScale
    assert(qGap <= r && 2 * lonGap * cosHi / GeoOps.GeoCosScale > r)
    assert(out(4L)._1 === 1L && out(4L)._2.contains(qGap * qGap))
    assert(out(5L)._1 === 2L)
    assert(out(6L)._1 === 1L)
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

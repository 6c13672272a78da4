package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The scale rewrites checked against their naive forms IN-ENGINE (the
  * DuckDB oracle checks them cross-engine at sf0.01; this pins the
  * equivalences at a different SF and keeps them local to `sbt test`).
  */
class ScaleOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketized range join == naive BETWEEN join") {
    val rewritten = ScaleOps.rangeJoin(spark, sf).collect().toSeq
    // the naive form the oracle states: every (interval, order) pair
    // filtered on containment — fine at sf0.001, a non-starter at scale
    val orders = Tables.orders(spark, sf)
    val intervals = orders.filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey").as("i_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("lo"))
      .withColumn("hi", date_add(col("lo"), 30))
    val naive = intervals.crossJoin(
        orders.select(to_date(col("o_orderdate")).as("od"), col("o_totalprice")))
      .filter(col("od") >= col("lo") && col("od") <= col("hi"))
      .groupBy(col("i_custkey"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
      .orderBy(col("i_custkey"))
      .collect().toSeq
    assert(rewritten === naive)
    assert(rewritten.nonEmpty)
  }

  test("salted two-phase aggregate == direct groupBy, for any salt") {
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_price"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    assert(ScaleOps.saltedAgg(spark, sf).collect().toSeq === direct)
  }

  test("salted join == plain join, matches and aggregates identical") {
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(ScaleOps.saltedJoin(spark, sf).collect().toSeq === direct)
  }

  test("built-in session_window == the custom gap fold's batch analog") {
    val builtin = graft.streaming.Streams.sessionWindowBatch(spark, sf).collect().toSeq
    val fold = graft.streaming.Streams.sessionizeBatch(spark, sf).collect().toSeq
    assert(builtin === fold)
    assert(builtin.nonEmpty)
  }

  test("int8 quantization: reconstruction error is bounded by one level width") {
    // |x − dequant(x)| < scale by construction (floor drops < 1 level), so
    // the MEAN abs error must also be < scale = (max−min)/255 per vector
    val q = VectorOps.vecQuantize(spark, sf)
      .withColumn("scale", (col("mx") - col("mn")) / 255)
    assert(q.filter(col("scale") > 0 && col("mean_abs_err") >= col("scale")).count() === 0)
    assert(q.filter(col("mean_abs_err") < 0).count() === 0)
    assert(q.count() > 0)
  }

  test("winsorize: fixture bounds interpolate exactly, nulls stay null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winsor").toString
    // values 1..20 in one group: quantile_cont gives p05 = 1.95, p95 = 19.05
    ((1 to 20).map(i => (i.toLong, 1000000000L * i, "a", Some(i.toDouble)))
      :+ ((21L, 21000000000L, "a", None: Option[Double])))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = ScaleOps.winsorize(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(rows(1).getDouble(3) - 1.95) < 1e-12)
    assert(math.abs(rows(1).getDouble(4) - 19.05) < 1e-12)
    // clipping lands EXACTLY on the group's own bounds
    assert(rows(1).getDouble(5) === rows(1).getDouble(3) && rows(1).getBoolean(6))
    assert(rows(20).getDouble(5) === rows(20).getDouble(4) && rows(20).getBoolean(6))
    assert(rows(10).getDouble(5) === 10.0 && !rows(10).getBoolean(6)) // untouched
    assert(rows(21).isNullAt(2) && rows(21).isNullAt(5) && rows(21).isNullAt(6))
    // corpus invariant: every clipped value is inside its group's bounds
    val out = ScaleOps.winsorize(spark, sf)
    assert(out.filter(col("clipped") < col("lo") || col("clipped") > col("hi"))
      .count() === 0)
    assert(out.filter(col("is_clipped") =!= (col("value") =!= col("clipped")))
      .count() === 0)
  }

  test("stratified sample: membership is the hash rule, rates land near target") {
    val s = ScaleOps.stratifiedSample(spark, sf)
    assert(s.filter(col("h_bucket") >= col("strat_rate")).count() === 0)
    val total = Tables.events(spark, sf).count().toDouble
    // purchase keeps 100% — exact; hash strata are binomial around p
    val byType = s.groupBy(col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val purchases = Tables.events(spark, sf)
      .filter(lower(col("event_type")) === "purchase").count()
    assert(byType.getOrElse("purchase", 0L) === purchases)
    val clickRate = byType.getOrElse("click", 0L) /
      Tables.events(spark, sf).filter(lower(col("event_type")) === "click").count().toDouble
    assert(clickRate > 0.1 && clickRate < 0.3, s"click keep-rate $clickRate far from 0.20")
    assert(total > 0)
  }
}

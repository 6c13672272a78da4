package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** At-scale operator shapes beyond the reference surface: a bucketized
  * range (point-in-interval) join and deterministic stratified sampling —
  * the two remaining join/sampling primitives a 100 TB training-data
  * pipeline leans on that no existing entry demonstrated.
  *
  * Both follow the repo's escape-hatch pattern (`q_theta_prefilter`,
  * `q_multi_count_distinct_twophase`): the DuckDB oracle states the naive
  * declarative form; the Spark side plans the shape that survives scale.
  */
object ScaleOps {

  /** Pure range join — no equi key — rewritten as a bucket equi-join.
    *
    * Shape: per-customer 30-day interval [first_order_date, +30d] probed by
    * EVERY order's date (which orders, from anyone, landed inside each
    * window). The naive plan is a nested-loop BETWEEN join — quadratic, the
    * classic scale-killer DuckDB hides behind its IEJoin optimizer and Spark
    * would execute as BNLJ. The rewrite: explode each interval into the
    * calendar-month buckets it overlaps (O(span/bucket) rows — here ≤ 2),
    * bucket every probe by its own month (map-only), equi-join on the
    * bucket, and apply the exact BETWEEN as a post-join filter. Complete
    * because an interval overlaps every month bucket its points can fall in;
    * exact because the residual filter keeps only true containment. The
    * join is hash, never nested-loop, and the bucket width is the knob that
    * trades explode factor against bucket selectivity at 100 TB.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val intervals = orders.filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey").as("i_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("lo"))
      .withColumn("hi", date_add(col("lo"), 30))
    val banded = intervals.withColumn("bucket",
      explode(expr("sequence(date_trunc('MONTH', lo), date_trunc('MONTH', hi), interval 1 month)")))
    val probes = orders
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
      .withColumn("bucket", date_trunc("MONTH", col("od")))
    banded.join(probes, Seq("bucket"))
      .filter(col("od") >= col("lo") && col("od") <= col("hi"))
      .groupBy(col("i_custkey"), col("lo"), col("hi"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .orderBy(col("i_custkey"))
  }

  /** Deterministic stratified sampling — the training-data downsampling
    * primitive. Each stratum (event_type) gets its own keep-rate; membership
    * is decided by a content hash of the row key (first 8 md5 hex digits mod
    * 100), NOT by rand(): the sample is reproducible across runs, engines,
    * and partitionings — the property that makes a 100 TB train/eval split
    * auditable. Map-only: no shuffle, no state, embarrassingly parallel.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(lower(col("event_type")) === "purchase", 100)
      .when(lower(col("event_type")) === "signup", 50)
      .when(lower(col("event_type")) === "click", 20)
      .otherwise(5) // views + malformed strata: keep a trickle for auditing
    Tables.events(spark, dir)
      .withColumn("strat_rate", rate)
      .withColumn("h_bucket",
        (conv(substring(md5(col("event_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType) % 100).cast(IntegerType))
      .filter(col("h_bucket") < col("strat_rate"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("strat_rate").cast(IntegerType).as("strat_rate"), col("h_bucket"))
      .orderBy(col("event_id"))
  }
}

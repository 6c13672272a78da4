package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** EP2 fact-build shapes re-targeted at the driver testdata so the OLAP
  * layer's two expensive statements are ORACLE-checkable and benchable, the
  * way `q_hourly_counts` re-targeted the streaming transform. The genuine
  * fact builds over the reference data model live in [[graft.olap.Facts]];
  * these functions exercise the identical plan shapes — star-join +
  * conditional aggregation at a declared grain, and as-of SCD2 resolution
  * feeding a 4× exact COUNT(DISTINCT) grain — over tables the DuckDB oracle
  * can also read.
  */
object FactOps {

  /** fact_pollination_activity's shape (08_ETL2_part2.sql:5-66): multi-way
    * star join (two shuffle dims + one broadcast dim + an arithmetic date
    * key) into a grouped grain with plain + conditional measures. part and
    * supplier scale with the fact at 100 TB, so they shuffle-join; nation is
    * bounded → broadcast. The grain shuffles once on its three key columns
    * with map-side partial aggregation.
    */
  def factActivity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .withColumn("date_sk",
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast(IntegerType))
      .groupBy(col("p_brand"), col("n_name").as("supp_nation"), col("date_sk"))
      .agg(
        count(lit(1)).as("n_lines"),
        CoreOps.dsum(col("l_quantity")).as("sum_qty"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"),
        count(when(col("l_discount") > 0.05, 1)).as("n_highdisc"))
      .orderBy(col("p_brand"), col("supp_nation"), col("date_sk"))
  }

  /** fact_user_monthly_summary's shape (08_ETL2_part2.sql:88-109,127-185):
    * the as-of SCD2 "subscription" resolution (latest order at-or-before the
    * event, earliest-order fallback — C5/C6, same union-tag single-window
    * sort-merge as [[CoreOps.asofJoin]], event payload carried through the
    * union so no second join on event_id) feeding a grain with four exact
    * COUNT(DISTINCT) measures (D5). One shuffle for the as-of window + the
    * grain's Expand shuffle — the reference's most expensive statement,
    * end-to-end.
    */
  def factMonthlySummary(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"), col("props"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val tagged = ord.select(
        col("o_custkey").as("user_id"),
        col("o_orderdate").cast(TimestampType).as("ts"),
        lit(0).as("is_event"),
        col("o_orderkey").as("orderkey"),
        lit(null).cast(LongType).as("event_id"),
        lit(null).cast(StringType).as("event_type"),
        lit(null).cast(DoubleType).as("value"),
        lit(null).cast(StringType).as("props"))
      .unionAll(ev.select(
        col("user_id"), col("ts"), lit(1).as("is_event"),
        lit(null).cast(LongType).as("orderkey"),
        col("event_id"), col("event_type"), col("value"), col("props")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_event"), col("orderkey"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tagged
      .withColumn("asof_orderkey", last(col("orderkey"), ignoreNulls = true).over(wCum))
      .withColumn("earliest_orderkey", first(col("orderkey"), ignoreNulls = true).over(wAll))
      .filter(col("is_event") === 1)
      .withColumn("sub_sk", coalesce(col("asof_orderkey"), col("earliest_orderkey")))
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month_year"),
        col("sub_sk"))
      .agg(
        count(lit(1)).as("n_events"),
        CoreOps.dsum(col("value")).as("total_value"),
        countDistinct(col("event_type")).as("n_event_types"),
        countDistinct(col("ts").cast(DateType)).as("n_active_days"),
        countDistinct(col("value")).as("n_distinct_values"),
        countDistinct(col("props")).as("n_distinct_props"))
      .orderBy(col("user_id"), col("month_year"), col("sub_sk"))
  }
}

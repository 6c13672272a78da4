package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import CoreOps.{dsum, drevenue}

/** The reference's seven analytical queries (03_sql/05_queries)
  * re-targeted to the driver testdata per FIXTURES.md §2's role mapping
  * (observations→lineitem/orders, users→customer, dims→nation/part/supplier).
  * Shapes preserved: scan→join→group→sort→limit, CTE + window argmax.
  * All sorts carry full tie-breaks so output is deterministic (the reference
  * relies on Postgres's stable-but-unspecified order; SURVEY.md §5).
  */
object Analytics {

  /** olap_queries.sql:5-16 — top-5 months by confirmed pollinations,
    * EXCLUDING January (placeholder-month semantics, README.md:26):
    * here, top-5 (year, month) by returned-item count, excluding January.
    */
  def topMonthsExclJan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(month(col("l_shipdate")) =!= 1)
      .filter(col("l_returnflag") === "R")
      .groupBy(
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("n_returned"))
      .orderBy(col("n_returned").desc, col("ship_year"), col("ship_month"))
      .limit(5)

  /** olap_queries.sql:18-35 — top-10 location×month by observations:
    * here, top-10 (nation, order month) by order count.
    */
  def topLocationMonths(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("n_orders").desc, col("n_name"), col("order_month"))
      .limit(10)
  }

  /** oltp_queries.sql:5-15 — top plant–pollinator pairs: here, top-10
    * (part, supplier) pairs by lineitem count.
    */
  def topPairs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    val s  = Tables.supplier(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .groupBy(col("p_name"), col("s_name"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("n_lines").desc, col("p_name"), col("s_name"))
      .limit(10)
  }

  /** oltp_queries.sql:17-24 — habitat ranking (full ordered output, F2):
    * here, market segments ranked by customer count.
    */
  def habitatRank(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("n_customers").desc, col("c_mktsegment"))

  /** oltp_queries.sql:26-37 — pollination-quality summary with
    * COUNT(*) FILTER: here, per order-priority totals with filtered counts.
    */
  def qualitySummary(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_large"),
        dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))

  /** oltp_queries.sql:39-47 — top users by observation count: here, top-10
    * customers by order count.
    */
  def topUsers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("c_custkey"))
      .limit(10)
  }

  /** olap_queries.sql:38-69 — the most complex reference query: per-user
    * argmax month by distinct locations (CTE → COUNT(DISTINCT) → ROW_NUMBER
    * → rn=1 → top-10). Here: per-customer month with most distinct suppliers.
    */
  def topMonthlyUniqueLocations(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val userMonthly = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(
        col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(countDistinct(col("l_suppkey")).as("n_distinct_suppliers"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("n_distinct_suppliers").desc, col("order_month"))
    userMonthly
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("order_month"), col("n_distinct_suppliers"))
      .orderBy(col("n_distinct_suppliers").desc, col("o_custkey"))
      .limit(10)
  }
}

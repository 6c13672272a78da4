package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Classic OLAP reshaping operators beyond the reference surface: pivot /
  * unpivot, rollup subtotals with grouping flags, and the full ranking
  * window-function battery. The reference never reshapes (its §2.E window
  * use stops at row_number/LAG), but any warehouse user expects these, and
  * each has a clean scale story noted at its site.
  */
object OlapOps {

  private val EventTypes = Seq("click", "view", "purchase", "signup")

  /** Long→wide: per-user event counts, one column per event type. The value
    * list is EXPLICIT — `pivot(col)` without it runs a whole extra
    * distinct-collect job over the fact table to discover columns, and the
    * output schema becomes data-dependent (a silent schema drift at 100 TB
    * when a new type appears; here a new type lands in no column and the
    * pipeline fails loudly at review, not at runtime). Cells with no rows
    * surface as NULL from pivot's internal first-agg, so counts are
    * coalesced back to 0 — the contract a count column implies.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot(lower(col("event_type")), EventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))

  /** Time-series gap filling: hourly per-type event counts over a DENSE
    * hour grid, missing hours zero-filled — the resample step every
    * monitoring/trend query needs (a LAG over sparse hours silently skips
    * gaps; charts and window stats require the dense axis).
    *
    * The grid is built WITHOUT a driver collect: the 1-row global
    * (min, max) aggregate cross-joins (broadcast, 1×N — not a cartesian
    * hazard) the distinct event types, and `sequence()` explodes the hour
    * axis. Grid size is |types| × |hours| — dimension-scale regardless of
    * fact row count, so the left join stays a broadcast probe of the
    * sparse aggregate at any SF.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(lower(col("event_type")).as("event_type"),
        date_trunc("hour", col("ts")).as("hour_start"))
    val hourly = events.groupBy(col("event_type"), col("hour_start"))
      .agg(count(lit(1)).as("n"))
    // span and type list derive from the ALREADY-REDUCED hourly aggregate
    // (|types|×|hours| rows), not from events — one fact scan total, never
    // three (hourly contains every (type, hour) present by construction)
    val span = hourly.agg(min(col("hour_start")).as("h0"), max(col("hour_start")).as("h1"))
    val grid = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour_start"))
    grid.join(hourly, Seq("event_type", "hour_start"), "left")
      .select(col("event_type"), col("hour_start"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** Wide→long: every part's numeric attributes melted to (metric, value)
    * rows — the normalization step feeding generic per-metric aggregation.
    * Map-only (a Generate over the row, no shuffle), the exact inverse
    * shape of [[pivotEvents]].
    */
  def unpivotParts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast(DoubleType).as("size"),
        col("p_retailprice").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  /** ROLLUP subtotals: (year, priority) → per-pair, per-year, grand total in
    * ONE pass. Spark plans rollup as a single Expand (3 grouping sets ⇒ 3×
    * pre-shuffle rows) + one hash aggregate — cheaper than 3 separate
    * aggregations at every scale, and the same Expand trade documented for
    * multi-distinct (SCALE.md, Aggregation). `grouping()` flags distinguish
    * a subtotal NULL from a NULL in the data — the only correct way to
    * consume rollup output.
    */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")).cast(IntegerType))
      .rollup(col("order_year"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"),
        grouping(col("order_year")).cast(IntegerType).as("g_year"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"))
      .orderBy(col("order_year").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** CUBE: all four grouping sets of (year, priority) — per-pair, per-year,
    * per-priority, grand total — in the same single Expand + aggregate pass
    * as [[rollupOrders]] (4 sets ⇒ 4× pre-shuffle rows). Rollup answers the
    * hierarchy drill; cube answers every marginal at once.
    */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")).cast(IntegerType))
      .cube(col("order_year"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"),
        grouping(col("order_year")).cast(IntegerType).as("g_year"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"))
      .orderBy(col("order_year").asc_nulls_first, col("o_orderpriority").asc_nulls_first,
        col("g_year"), col("g_prio"))

  /** Explicit GROUPING SETS — the general form [[rollupOrders]]/[[cubeOrders]]
    * are sugar for: exactly the (year), (priority) marginals with NO
    * (year, priority) pair rows and no grand total, which neither rollup
    * nor cube can express. Same single Expand + one aggregate pass (2 sets
    * ⇒ 2× pre-shuffle rows — you pay only for the sets you ask for).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")).cast(IntegerType))
      .createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT order_year, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(grouping(order_year) AS INT) AS g_year,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((order_year), (o_orderpriority))
        |ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Correlated scalar subquery, served through the SQL ENTRY POINT — the
    * one surface the other entries don't exercise: `spark.sql` over temp
    * views. Catalyst DECORRELATES the per-row subquery into one aggregate +
    * one left outer join (visible in the plan — no per-row re-execution,
    * the thing that makes correlated subqueries survive a fact-scale outer
    * side), so SQL users get the same plan the DataFrame API would build.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("sq_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("sq_orders")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  CAST((SELECT MAX(CAST(o_totalprice AS DECIMAL(12,2))) FROM sq_orders
        |        WHERE o_custkey = c_custkey) AS DOUBLE) AS max_order,
        |  (SELECT COUNT(*) FROM sq_orders
        |   WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS n_finished
        |FROM sq_customer ORDER BY c_custkey""".stripMargin)
  }

  /** Time-decayed activity score — the recency weighting a training-data
    * pipeline applies so fresh interactions outweigh stale ones: weight
    * 0.5^(age_weeks, capped) per event, summed per user. The numeric
    * design is what makes this ORACLE-HASHABLE: 0.5^k is an exact IEEE
    * power of two (identical in every engine), the weight and value are
    * multiplied and SUMMED AS DECIMALS (exact, order-independent — a
    * double sum's rounding depends on partition arrival order and would
    * flap the hash), cast to double only at the output edge — the same
    * discipline as the monetary sums. Map-only except the final combining
    * groupBy; the 1-row max-date aggregate broadcasts (gapFill pattern).
    */
  def decayScore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
    val tmax = ev.agg(max(col("d")).as("tmax"))
    ev.crossJoin(broadcast(tmax))
      .withColumn("k",
        least(floor(datediff(col("tmax"), col("d")) / 7), lit(10)).cast(IntegerType))
      .withColumn("wv",
        pow(lit(0.5), col("k")).cast(DecimalType(13, 12)) *
          col("value").cast(DecimalType(12, 2)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("wv")).cast(DoubleType).as("decay_score"))
      .orderBy(col("user_id"))
  }

  /** Array aggregation: per-user event-type profile as a SORTED distinct
    * array plus first/last activity. `collect_set` alone is
    * order-NONDETERMINISTIC (partition arrival order) — `array_sort` on
    * top is what makes an array-valued column reproducible across runs,
    * partitionings, and engines; without it an oracle hash (or a
    * downstream exact-dedup of the profile column!) flaps randomly.
    */
  def collectTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        // serialized for the cross-engine hash; the sort is the point
        array_join(array_sort(collect_set(lower(col("event_type")))), " ")
          .as("event_types"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** Equi-width histogram of order totals — fixed [lo, hi) buckets with
    * arithmetic bucket assignment (one map-side-combining groupBy on the
    * bucket id; |buckets| output rows regardless of fact size). Bounds are
    * FIXED constants, not a data-dependent min/max pre-pass — the
    * production shape when the domain is known; a data-driven span costs
    * one extra 1-row aggregate (the [[gapFill]] pattern).
    *
    * Edge buckets are CATCH-ALLS: values outside [lo, hi) clamp into
    * bucket 0 / bucket nb−1, so bucket_lo/bucket_hi label the nominal bin,
    * not a bound on its contents — min_v/max_v carry the actual extremes
    * (the standard histogram underflow/overflow-bin convention; dropping
    * out-of-range rows would silently hide outliers).
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val lo = 0.0
    val hi = 600000.0
    val nb = 12
    val w = (hi - lo) / nb
    Tables.orders(spark, dir)
      .select(col("o_totalprice").cast(DoubleType).as("v"))
      .withColumn("bucket",
        least(greatest(floor((col("v") - lo) / w), lit(0.0)), lit(nb - 1.0))
          .cast(IntegerType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .withColumn("bucket_lo", col("bucket") * w + lo)
      .withColumn("bucket_hi", (col("bucket") + 1) * w + lo)
      .select(col("bucket"), col("bucket_lo"), col("bucket_hi"),
        col("n_orders"), col("min_v"), col("max_v"))
      .orderBy(col("bucket"))
  }

  /** LATERAL correlated table subquery — the per-row top-N idiom SQL users
    * write (`... , LATERAL (SELECT ... WHERE fk = pk ORDER BY x LIMIT 2)`).
    * Catalyst plans the DecorrelateInnerQuery rewrite: the lateral becomes
    * a partitioned rank over the inner table + one equi-join — the SAME
    * plan the DataFrame window form builds, never a per-outer-row
    * re-execution (which at fact scale would be O(outer) separate scans).
    * Demonstrated over the SQL entry point like [[scalarSubquery]].
    */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("lt_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("lt_orders")
    spark.sql(
      """SELECT c_custkey, o_orderkey,
        |  CAST(o_totalprice AS DOUBLE) AS totalprice
        |FROM lt_customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM lt_orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |WHERE c_custkey < 200
        |ORDER BY c_custkey, totalprice DESC, o_orderkey""".stripMargin)
  }

  /** RANGE window frame — peers by VALUE distance, not row position: each
    * order's trailing 3-day (value-range) order count and spend per
    * customer. Unlike the ROWS frames in [[windowBattery]], RANGE includes
    * every peer inside the value interval regardless of tie count, which is
    * the correct semantics for time-decayed features. The frame key is
    * days-since-epoch (a long), so the window stays one shuffle+sort with a
    * numeric range probe.
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-2, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("day_num", datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast(LongType))
      .select(
        col("o_custkey"), col("o_orderkey"), col("day_num"),
        count(lit(1)).over(w).as("n_orders_3d"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).over(w)
          .cast(DoubleType).as("spend_3d"))
      .orderBy(col("o_custkey"), col("day_num"), col("o_orderkey"))
  }

  /** The ranking window battery over one per-customer pass: rank /
    * dense_rank / percent_rank / ntile(4) / cume_dist / lag / lead and a
    * running sum share a SINGLE window definition, so Catalyst evaluates
    * all eight in one WindowExec over one (custkey) shuffle+sort — the
    * whole battery costs what one function costs. percent_rank and
    * cume_dist are exact integer ratios evaluated in doubles (one division
    * — cross-engine deterministic, same argument as q_tfidf's score).
    */
  def windowBattery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 10 === 0) // a probe slice keeps output honest but small
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cdist"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).over(cum)
          .cast(DoubleType).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // ------------------------------------------------------------- skyline
  /** Price-band width (cents) carrying the two-level prefix max. */
  private[graft] val SkyBandCents = 1000L

  /** 2-D skyline (Pareto frontier) over the part catalog: the set of
    * (price, size) points not DOMINATED by any other part — q dominates p
    * when q is no more expensive, no smaller, and strictly better on one
    * axis. The classic dominance query relational engines lack as a
    * primitive; with two criteria it reduces to a prefix-max sweep:
    * p survives iff its size exceeds the best size at any strictly
    * lower price (and it is its own price group's best).
    *
    * The sweep uses the ksTest two-level shape — PlanGuard bans the
    * single global cummax window a one-box engine would reach for:
    * parts reduce to one row per distinct price (each price's max size
    * + how many parts sit at that point), prices hash into fixed-width
    * bands, the strictly-preceding prefix max WITHIN a band is a window
    * partitioned by band, and cross-band offsets come from a triangular
    * probe over the band-max aggregate (≤ price-range/width rows,
    * sanctioned tiny build side). Output is the frontier sorted by
    * price — O(distinct prices) rows, each carrying its population.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.part(spark, dir)
      .select((col("p_retailprice").cast(DecimalType(12, 2)) * 100)
        .cast(LongType).as("cents"), col("p_size").cast(LongType).as("size"))
      .groupBy(col("cents"), col("size")).agg(count(lit(1)).as("n_parts"))
    val best = g
      .withColumn("ms", max(col("size")).over(Window.partitionBy(col("cents"))))
      .filter(col("size") === col("ms"))
      .select(col("cents"), col("size"), col("n_parts"))
      .withColumn("band", expr(s"cents div $SkyBandCents"))
    val wBand = Window.partitionBy(col("band")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBand = best.withColumn("prev_in", max(col("size")).over(wBand))
    val bandMax = best.groupBy(col("band")).agg(max(col("size")).as("bmax"))
    val offsets = bandMax.select(col("band").as("b"))
      .join(broadcast(bandMax), col("band") < col("b"), "left")
      .groupBy(col("b")).agg(max(col("bmax")).as("off"))
    inBand.join(broadcast(offsets), col("band") === col("b"))
      .withColumn("mlt",
        greatest(coalesce(col("off"), lit(-1L)), coalesce(col("prev_in"), lit(-1L))))
      .filter(col("size") > col("mlt"))
      .select(col("cents").as("price_cents"), col("size").as("max_size"),
        col("n_parts"))
      .orderBy(col("price_cents"))
  }

  // ----------------------------------------------------------- drill-across
  /** Kimball drill-across: two fact tables at different grains (order
    * revenue, event activity) each aggregate to the CONFORMED calendar
    * month and FULL-OUTER merge on it — the multi-fact report pattern
    * that must never join fact-to-fact at row grain (a fan-out trap:
    * joining facts before aggregating double-counts both measures).
    * Each fact reduces to O(months) rows first with map-side combine;
    * the merge is a months-sized full outer join; counts coalesce to 0,
    * measures stay NULL where a fact has no rows for the month (the two
    * testdata facts cover disjoint year ranges, so both null sides are
    * exercised). At 100 TB the pre-aggregation IS the operator: the
    * join input is calendar-bounded no matter the fact volume.
    */
  def drillAcross(spark: SparkSession, dir: String): DataFrame = {
    def monthKey(c: Column): Column =
      (year(c) * 100 + month(c)).cast(LongType)
    val rev = Tables.orders(spark, dir)
      .groupBy(monthKey(col("o_orderdate")).as("month_key"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType))
          .as("revenue_cents"))
    val act = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(monthKey(col("ts")).as("month_key"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast(DecimalType(12, 2)) * 100).cast(LongType))
          .as("event_value_cents"))
    rev.join(act, Seq("month_key"), "full_outer")
      .select(col("month_key"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("revenue_cents"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("event_value_cents"))
      .orderBy(col("month_key"))
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational operator parity queries (SURVEY.md §2 A–H) over the driver
  * testdata tables. Every query is deterministic (fully tie-broken sorts,
  * exact decimal accumulation for monetary sums) so its parquet output
  * hash-matches the DuckDB oracle in `SparkEntry.oracleSql`.
  *
  * Reference semantics being re-expressed are cited per function as
  * `file:line` relative to /root/reference/.
  */
object CoreOps {

  /** Monetary values in testdata have 2 decimal digits; accumulating them as
    * DECIMAL(12,2) makes sums exact and order-independent (double-summation
    * order differs between Spark partitions and DuckDB), then the final cast
    * to double is deterministic. Mirrors SURVEY.md §5 determinism notes.
    */
  private val Dec = DecimalType(12, 2)
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** revenue = sum(price * (1 - discount)) with exact decimal arithmetic. */
  def drevenue(price: Column, disc: Column): Column =
    sum(price.cast(Dec) * (lit(1).cast(Dec) - disc.cast(Dec))).cast("double")

  // ---------------------------------------------------------------- D1/D2/F2
  /** Pricing-summary aggregation (reference D1/D2 GROUP BY + COUNT/SUM shape,
    * e.g. 08_ETL2_part2.sql:25-35): per (returnflag, linestatus) totals.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        drevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // -------------------------------------------------------------------- F1
  /** Top-k by aggregate (olap_queries.sql:15-16 ORDER BY … DESC LIMIT n),
    * 3-way FK join (C1). Fully tie-broken by c_custkey for determinism.
    */
  def topkRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  // -------------------------------------------------------------------- C1
  /** Multi-way inner equi-join resolving FK chains to small dims
    * (02_ETL1_part1.sql:49-62 staging-name→id resolution shape). Dims are
    * broadcast — at 100 TB the fact side never shuffles for these joins.
    */
  def joinMultiway(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_items"),
        drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("r_name"))
  }

  // -------------------------------------------------------------------- C2
  /** Left outer join keeping unmatched rows (02_ETL1_part1.sql:70-74 optional
    * city dim). count(col) null-skips exactly like SQL COUNT(col).
    */
  def leftJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0))).as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- B6/B7/A9
  /** Anti join = NOT EXISTS / NOT IN with non-null keys
    * (02_ETL1_part1.sql:42-44, 03_ETL1_part2.sql:152-157): customers having
    * no large order.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // -------------------------------------------------------------------- C10
  /** Semi join = EXISTS: customers with at least one urgent order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val urgent = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------- A4/B2-B5 (split)
  /** Validation rule list for events — first failing rule wins, mirroring the
    * sequential quarantine inserts of 04_ETL1_part3.sql:158-229 (each DELETEs
    * matched rows before the next rule runs).
    */
  private[graft] def eventError: Column =
    // every rule null-guards its column (B2): a negated isin/rlike over a
    // NULL is NULL, which when() SKIPS — without the guard a NULL-typed or
    // NULL-props row would fall through every rule and ship as valid
    when(col("value").isNull || col("value") < 0, "value out of range")
      .when(col("event_type").isNull ||
          !upper(col("event_type")).isin("CLICK", "VIEW", "PURCHASE", "SIGNUP"),
        "unknown event_type")
      .when(col("value") > 400, "value above limit")
      .when(col("props").isNull || !col("props").rlike("^\\{\"k\": [0-9]+\\}$"),
        "malformed props")
      .otherwise(null)

  /** Quarantine sink (A4): invalid rows + error reason, like
    * invalid_stg_insect_observations (04_ETL1_part3.sql:71-75,158-229).
    */
  def quarantineInvalid(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("error_message", eventError)
      .filter(col("error_message").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"), col("error_message"))
      .orderBy(col("event_id"))

  /** Staging after quarantine delete (A9, 04_ETL1_part3.sql:168-172,232-235):
    * the valid remainder.
    */
  def quarantineValid(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(eventError.isNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  // ---------------------------------------------------------------- A8/B8/B10
  /** Scrub pass: NULLIF/TRIM/COALESCE/CASE (04_ETL1_part3.sql:117-154 NA→NULL
    * + trim-empty scrub; 03_ETL1_part2.sql:112-121 CASE branching).
    */
  def scrubCase(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        coalesce(when(trim(col("p_name")) === "", null)
          .otherwise(trim(col("p_name"))), lit("unknown")).as("name_clean"),
        when(col("p_size").between(1, 25), "small")
          .when(col("p_size").between(26, 40), "medium")
          .otherwise("large").as("size_class"))
      .orderBy(col("p_partkey"))

  // ---------------------------------------------------------------- D7/F3
  /** DISTINCT ON (k) ... ORDER BY k, tiebreak (03_ETL1_part2.sql:108-133
    * earliest-join_date user dedup): earliest order per customer.
    */
  def distinctOn(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("first_order_date"))
      .orderBy(col("o_custkey"))
  }

  // -------------------------------------------------------------------- E1
  /** SCD2 end-dating via window (03_ETL1_part2.sql:159-188): each order opens
    * a "version" closed by the next one minus one day; last version open-ended.
    */
  def scd2Lag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("next_start", lead(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("start_date"),
        date_sub(col("next_start").cast(DateType), 1).as("end_date"))
      .orderBy(col("o_custkey"), col("start_date"), col("o_orderkey"))
  }

  // ------------------------------------------------------------------ C5/C6
  /** Temporal as-of join with earliest-record fallback
    * (08_ETL2_part2.sql:98-104): for each event, the latest order of that
    * user at-or-before the event time, else the user's earliest order.
    * Equi key (user) + range condition → shuffled join, scales at 100 TB;
    * the per-event argmax is a window, not a driver loop.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    // Union-tag sort-merge as-of: tag both inputs, shuffle ONCE on the user
    // key, sort by time within each user, and resolve with two window
    // functions in a single pass. No events×orders candidate fanout (the
    // old plan materialized Σ(events_u · orders_u) rows before pruning) and
    // no broadcast of a per-user table (OOM at 100 TB). This is the classic
    // distributed as-of-join shape: cost is one shuffle + one sort.
    val tagged = ord.select(
        col("o_custkey").as("user_id"),
        col("o_orderdate").cast(TimestampType).as("ts"),
        lit(0).as("is_event"),
        col("o_orderkey").as("orderkey"),
        lit(null).cast(LongType).as("event_id"))
      .unionAll(ev.select(
        col("user_id"),
        col("ts"),
        lit(1).as("is_event"),
        lit(null).cast(LongType).as("orderkey"),
        col("event_id")))
    // Orders sort before events at equal ts (is_event 0 < 1) so an order ON
    // the event time is visible — matches the original o_orderdate <= ts.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_event"), col("orderkey"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tagged
      // latest order at-or-before this row = last non-null orderkey so far
      .withColumn("asof_orderkey", last(col("orderkey"), ignoreNulls = true).over(wCum))
      // earliest-order fallback folded into the same window pass
      .withColumn("earliest_orderkey", first(col("orderkey"), ignoreNulls = true).over(wAll))
      .filter(col("is_event") === 1)
      .select(
        col("event_id"),
        coalesce(col("asof_orderkey"), col("earliest_orderkey")).as("resolved_orderkey"))
      .orderBy(col("event_id"))
  }

  // -------------------------------------------------------------------- C7
  /** Prioritized best-match resolution (04_ETL1_part3.sql:396-416): join all
    * candidate "versions" (SCD intervals derived from orders), class-rank
    * them, keep the best per event.
    */
  def priorityBestmatch(spark: SparkSession, dir: String): DataFrame = {
    val wLead = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val intervals = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("start_date", col("o_orderdate").cast(DateType))
      .withColumn("end_date",
        date_sub(lead(col("o_orderdate"), 1).over(wLead).cast(DateType), 1))
      .select(col("o_custkey"), col("o_orderkey"), col("start_date"), col("end_date"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts").cast(DateType).as("event_date"))
    val cand = ev.join(intervals, ev("user_id") === intervals("o_custkey"), "inner")
      .withColumn("prio",
        when(col("start_date") <= col("event_date") &&
          (col("end_date").isNull || col("end_date") >= col("event_date")), 1)
          .when(col("start_date").isNull, 2)
          .when(col("event_date") < col("start_date"), 3)
          .otherwise(4))
    val wBest = Window.partitionBy(col("event_id"))
      .orderBy(col("prio"), col("start_date"), col("o_orderkey"))
    cand.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey").as("matched_orderkey"), col("prio"))
      .orderBy(col("event_id"))
  }

  // -------------------------------------------------------------------- C4
  /** Theta join on substring containment (04_ETL1_part3.sql:395 authors ILIKE
    * '%'||last_name||'%'): events whose props contain a customer key's
    * digits; fan-out aggregated per event. Build side is filtered tiny and
    * broadcast → BroadcastNestedLoopJoin, the same shape that keeps this
    * viable when the probe side is 100 TB.
    */
  def thetaContains(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val cust = Tables.customer(spark, dir)
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"))
    ev.join(broadcast(cust), col("props").contains(col("c_custkey").cast(StringType)))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_matched"), min(col("c_custkey")).as("min_custkey"))
      .orderBy(col("event_id"))
  }

  /** The at-scale rewrite of [[thetaContains]] (SCALE.md, Joins): substring
    * containment of an all-digit key re-expressed as an EQUI-join on
    * enumerated candidate substrings. A digit-only pattern occurs in `props`
    * iff it is a substring of one of its maximal digit runs, so exploding
    * every 1–2 char substring of every digit run (key domain is < 100 ⇒ ≤ 2
    * chars; widen the `maxW` bound with the key domain) yields a complete,
    * duplicate-free candidate set after DISTINCT — and each matching
    * customer then contributes exactly one row per event, exactly like the
    * NLJ. Explode factor is O(len·maxW) per run; the join is hash, not
    * nested-loop — the shape that survives a build side too big to
    * broadcast. Hash-matches the [[thetaContains]] oracle, proving the
    * escape hatch exact.
    */
  def thetaPrefilter(spark: SparkSession, dir: String): DataFrame = {
    // single source of truth: the candidate-substring width is DERIVED from
    // the key-domain bound used in the filter below, so widening the bound
    // can never silently under-enumerate candidates (ADVICE r4)
    val keyBound = 100L
    val maxW = (keyBound - 1).toString.length
    val ev = Tables.events(spark, dir).select(col("event_id"), col("props"))
    val cands = ev
      .withColumn("run", explode(expr("regexp_extract_all(props, '[0-9]+', 0)")))
      .withColumn("sub", explode(expr(
        s"flatten(transform(sequence(1, length(run)), i -> transform(sequence(1, $maxW), w -> substring(run, i, w))))")))
      // trailing windows emit truncated (never empty) repeats; DISTINCT
      // below collapses them, no length filter needed
      .select(col("event_id"), col("sub"))
      .distinct()
    val cust = Tables.customer(spark, dir)
      .filter(col("c_custkey") < keyBound)
      .select(col("c_custkey"), col("c_custkey").cast(StringType).as("ck"))
    cands.join(cust, col("sub") === col("ck"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_matched"), min(col("c_custkey")).as("min_custkey"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- C8 + D8
  /** dim_date build (07_ETL2_part1.sql:53-64) + join on computed key
    * (08_ETL2_part2.sql:50-52): distinct (year, month) with month_name /
    * month_year and a row_number surrogate key (SURVEY.md §1: deterministic
    * SERIAL replacement), then lineitem joined on extracted year/month.
    */
  def dimDateJoin(spark: SparkSession, dir: String): DataFrame = {
    // dim months derive from the FACT's own date column (the reference
    // builds dim_date from the observation dates it will re-join,
    // 08_ETL2_part2.sql:50-52) — deriving them from another table's dates
    // silently dropped fact rows whose month that table never saw (2.5% of
    // lineitems at sf0.01: ship months trail order months)
    val li = Tables.lineitem(spark, dir)
    val dimDate = li
      .select(
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"))
      .distinct()
      // Arithmetic surrogate key (year*100+month), not a global-window
      // row_number: deterministic, collision-free, and needs no
      // single-partition sort — the standard SERIAL replacement for keys
      // derivable from the business key itself (SURVEY.md §1).
      .withColumn("date_sk", (col("year") * 100 + col("month")).cast(IntegerType))
      .withColumn("month_name",
        date_format(make_date(col("year"), col("month"), lit(1)), "MMMM"))
      .withColumn("month_year",
        date_format(make_date(col("year"), col("month"), lit(1)), "yyyy-MM"))
    li.join(broadcast(dimDate),
        year(li("l_shipdate")) === dimDate("year") &&
          month(li("l_shipdate")) === dimDate("month"), "inner")
      .groupBy(col("date_sk"), col("year"), col("month"), col("month_name"), col("month_year"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("year"), col("month"))
  }

  // -------------------------------------------------------------------- C11
  /** Case-insensitive equi-join (04_ETL1_part3.sql:332-333 LOWER(a)=LOWER(b))
    * against a row_number-keyed dim derived from distinct values.
    */
  def ciJoin(spark: SparkSession, dir: String): DataFrame = {
    val segDim = Tables.customer(spark, dir)
      .select(upper(col("c_mktsegment")).as("seg_name"))
      .distinct()
      // Hash surrogate key (first 8 hex digits of md5): deterministic and
      // fully distributed — no global-window sort. Hash keys are the
      // at-scale replacement for SERIAL when the domain isn't enumerable
      // arithmetically (SURVEY.md §1).
      .withColumn("seg_sk",
        conv(substring(md5(col("seg_name")), 1, 8), 16, 10).cast(LongType))
    val c = Tables.customer(spark, dir)
    c.join(broadcast(segDim), lower(c("c_mktsegment")) === lower(segDim("seg_name")))
      .groupBy(col("seg_sk"), col("seg_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("seg_name"))
  }

  // -------------------------------------------------------------------- A6
  /** Idempotent dim insert (07_ETL2_part1.sql:5-50 ON CONFLICT DO NOTHING →
    * anti-join): (part, supplier) pairs seen in the incoming half of the
    * fact stream that are absent from the "already loaded" earlier half.
    *
    * The halves split at max(l_orderkey)/2 by integer cross-
    * multiplication — an ADAPTIVE cut (the SF-coupled-constant
    * discipline; VERDICT r10: the old `c_custkey < 750` cut over the
    * 125-pair (segment, nation) domain saturated at sf0.01 and the entry
    * hash-matched on 0 rows — vacuous green). The (part, supplier) key
    * domain grows WITH the data, so genuinely-new dim members exist at
    * every SF (probed: 369 / 23 933 / 293 080 new pairs at the three
    * test SFs) and the anti-join is exercised for real. The 1-row max
    * aggregate broadcasts; both distincts are map-side-combinable.
    */
  def dimUpsertNew(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val halves = l.crossJoin(broadcast(l.agg(max(col("l_orderkey")).as("mx"))))
    val existing = halves.filter(col("l_orderkey") * 2 <= col("mx"))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val incoming = halves.filter(col("l_orderkey") * 2 > col("mx"))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    incoming.join(existing, Seq("l_partkey", "l_suppkey"), "left_anti")
      .orderBy(col("l_partkey"), col("l_suppkey"))
  }

  // ------------------------------------------------------------------ D3/D4
  /** Conditional aggregates (08_ETL2_part2.sql:27-35 SUM(CASE WHEN…);
    * oltp_queries.sql:30-31 COUNT(*) FILTER).
    */
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_highdisc"),
        count(when(col("l_tax") > 0.04, 1)).as("n_hightax"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  // -------------------------------------------------------------------- D5
  /** Multiple exact COUNT(DISTINCT) in one aggregation
    * (08_ETL2_part2.sql:146-149: 4 at once).
    */
  def multiCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        countDistinct(date_format(col("o_orderdate"), "yyyy-MM")).as("n_months"))
      .orderBy(col("o_custkey"))
  }

  /** Expand-free alternate of [[multiCountDistinct]], hash-matching the SAME
    * oracle — proving the documented escape hatch exact the way
    * [[thetaPrefilter]] proved C4's. Spark plans N exact COUNT(DISTINCT)s
    * with an Expand that replicates every pre-shuffle row N× (4× here); when
    * the fact side is 100 TB that multiplier IS the shuffle. The two-phase
    * form runs each distinct count as its own (key, value) distinct-groupBy
    * → count, then equi-joins the four grain-keyed results: no row
    * replication, 4 independent subtree scans instead — the right trade
    * when the distinct columns are wide/heavy or N is large, the wrong one
    * when a single scan is the dominant cost. Every key appears in all four
    * legs (the distinct columns are non-null here), so the inner joins are
    * lossless; nulls are filtered to match COUNT(DISTINCT) semantics
    * exactly.
    */
  def multiCountDistinctTwophase(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val base = o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"), col("l_partkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
    def phase(c: String, alias: String): DataFrame =
      base.select(col("o_custkey"), col(c))
        .filter(col(c).isNotNull)
        .distinct()
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(alias))
    phase("l_suppkey", "n_suppliers")
      .join(phase("l_partkey", "n_parts"), Seq("o_custkey"))
      .join(phase("o_orderkey", "n_orders"), Seq("o_custkey"))
      .join(phase("order_month", "n_months"), Seq("o_custkey"))
      .orderBy(col("o_custkey"))
  }

  // -------------------------------------------------------------------- D6
  /** Group key = expression (08_ETL2_part2.sql:113-118 GROUP BY COALESCE):
    * bucket customers by coalesced nullable-ish key.
    */
  def groupbyExpr(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("status_bucket",
        coalesce(when(col("o_orderstatus") === "P", null)
          .otherwise(col("o_orderstatus")), lit("PENDING")))
      .groupBy(col("status_bucket"), year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("status_bucket"), col("order_year"))

  // --------------------------------------------------------------------- G
  /** Set operations (SURVEY.md §2.G — absent in reference, covered for
    * completeness): INTERSECT / EXCEPT / UNION ALL over order-status key sets.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey")).distinct()
    val both  = f.intersect(p).select(lit("both").as("tag"), col("o_custkey"))
    val fOnly = f.except(p).select(lit("f_only").as("tag"), col("o_custkey"))
    both.unionAll(fOnly).orderBy(col("tag"), col("o_custkey"))
  }

  // --------------------------------------------------------------------- B3
  /** Regex validation + extraction (04_ETL1_part3.sql:183-221 `~` patterns).
    */
  def regexExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast(IntegerType).as("k_val"),
        when(col("props").rlike("^\\{\"k\": [0-9]+\\}$"), 1).otherwise(0).as("valid_props"),
        when(upper(col("event_type")).isin("CLICK", "VIEW"), 1).otherwise(0).as("is_passive"))
      .orderBy(col("event_id"))

  // --------------------------------------------------------------------- H
  /** String scalar battery (SURVEY.md §2.H): TRIM/UPPER/LOWER/INITCAP/
    * SPLIT_PART/REVERSE/POSITION/SUBSTRING/LPAD/||/LIKE/LENGTH over part.
    */
  def scalarStrings(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        trim(col("p_name")).as("name_trim"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        initcap(col("p_name")).as("name_initcap"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_name"), "widget").as("widget_pos"),
        expr("substring(p_name, 3)").as("name_from3"),
        lpad(col("p_size").cast(StringType), 3, "0").as("size_pad"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%bolt%"), 1).otherwise(0).as("is_bolt"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))

  /** Date scalar battery (§2.H): EXTRACT/TO_CHAR/TO_DATE/interval arithmetic
    * (07_ETL2_part1.sql:55-58; 03_ETL1_part2.sql:183).
    */
  def scalarDates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("order_date"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month_year"),
        date_sub(col("o_orderdate").cast(DateType), 1).as("prev_day"),
        date_add(col("o_orderdate").cast(DateType), 30).as("plus_30"),
        to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
          .as("roundtrip_date"))
      .orderBy(col("o_orderkey"))

  // -------------------------------------------------------------------- A7
  /** Keyed upsert, ON CONFLICT DO UPDATE (08_ETL2_part2.sql:60-66,119-122,
    * 178-185): the reference's fact loads recompute a keyed aggregate from
    * new staging rows and merge it into the existing fact — matched keys are
    * updated (counts accumulated), unmatched existing keys keep their row,
    * brand-new keys insert. In Spark the immutable equivalent is a full
    * outer join of old fact vs new batch on the arbiter key + coalesced
    * recompute, then overwrite — no row-level mutation, one shuffle on the
    * key, scale-safe at any fact size.
    */
  def factUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def slab(p: Column) = o.filter(p)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
    val existing = slab(year(col("o_orderdate")) < 1999)   // the loaded fact
    val batch    = slab(year(col("o_orderdate")) >= 1999)  // the new delta
    existing.alias("f").join(batch.alias("b"), Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey"),
        (coalesce(col("f.n_orders"), lit(0L)) + coalesce(col("b.n_orders"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("f.total_spend"), lit(0.0)) + coalesce(col("b.total_spend"), lit(0.0)))
          .as("total_spend"),
        when(col("f.n_orders").isNotNull && col("b.n_orders").isNotNull, "updated")
          .when(col("b.n_orders").isNotNull, "inserted")
          .otherwise("kept").as("merge_action"))
      .orderBy(col("o_custkey"))
  }

  // ------------------------------------------------------------- A8 (join)
  /** Join-update, UPDATE … FROM (07_ETL2_part1.sql:92-99,123-130): the SCD2
    * end-date catch-up sets a column from a joined source, keeping the old
    * value where no source row matches. Spark equivalent: left join +
    * COALESCE(new, old) + overwrite of the target — the whole UPDATE is one
    * broadcast-or-shuffle join, never a per-row mutation loop.
    */
  def joinUpdate(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val upd = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("settled_spend"))
    c.join(upd, c("c_custkey") === upd("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_acctbal").cast("double").as("old_bal"),
        coalesce(col("settled_spend"), col("c_acctbal").cast("double")).as("new_bal"),
        when(col("settled_spend").isNotNull, 1).otherwise(0).as("was_updated"))
      .orderBy(col("c_custkey"))
  }

  // -------------------------------------------------------------------- D8
  /** Static seed dimension (01_create_oltp.sql:130-150 INSERT … VALUES):
    * an in-code `createDataFrame(Seq(…))` dim, broadcast-joined to a fact.
    * Seeds are driver-local literals — they never touch the cluster until
    * the broadcast, exactly how a VALUES dim should behave at scale.
    */
  def seedDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prio = Seq(
      (1, "1-URGENT", true), (2, "2-HIGH", true), (3, "3-MEDIUM", false),
      (4, "4-NOT SPECIFIED", false), (5, "5-LOW", false))
      .toDF("prio_rank", "prio_name", "is_fast")
    Tables.orders(spark, dir)
      .join(broadcast(prio), col("o_orderpriority") === col("prio_name"))
      .groupBy(col("prio_rank"), col("prio_name"), col("is_fast"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("prio_rank"))
  }

  // -------------------------------------------------------------------- C9
  /** Null-guarded join condition (08_ETL2_part2.sql:39-41,44-46,47-49): the
    * reference's fact loads write `ob.caste_id IS NOT NULL AND
    * c.caste_id_bk = ob.caste_id` in their left-join ON clauses. A null key
    * never satisfies the equality anyway, so in Spark the plain equi-join is
    * semantically identical — and stays a hash/broadcast-able equi-join
    * instead of degrading on the extra predicate. The nullable key is
    * produced the way the reference produces them: a scrub that NULLs a
    * sentinel class of values (04_ETL1_part3.sql:117-134). The oracle spells
    * the guard explicitly; the hash match proves the equivalence.
    */
  def nullGuardJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("cust_key_n",
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_custkey")))
    val c = Tables.customer(spark, dir)
    o.join(c, o("cust_key_n") === c("c_custkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("c_custkey")).as("n_matched"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy(col("o_orderpriority"))
  }

  /** Cast battery (§2.H): ::INT, ::BOOLEAN from Y/N, DECIMAL(9,6)
    * (04_ETL1_part3.sql:439-452).
    */
  def scalarCasts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        when(col("l_returnflag") === "R", "Y").otherwise("N")
          .cast(BooleanType).as("returned_bool"),
        // DECIMAL(9,6) cast exercised, then surfaced as DOUBLE: DuckDB
        // renders the same decimal as float64 in its result set, so the
        // final physical type must agree for the driver's hash compare.
        col("l_discount").cast(DecimalType(9, 6)).cast("double").as("disc_dec"),
        col("l_linenumber").cast(StringType).as("line_str"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** JSON read battery — beyond-reference (§2.H notes the reference has no
    * JSON read functions; a warehouse user expects them): the TYPED path
    * (`from_json` against a declared schema — codegen'd Jackson parse once
    * per row, the right call when the shape is known) and the PATH
    * expression (`get_json_object`, the ad-hoc probe). Both are map-only
    * scalar work; at 100 TB the typed form additionally lets Catalyst
    * prune unparsed fields.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        expr("from_json(props, 'k INT').k").as("k_json"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_path"),
        get_json_object(col("props"), "$.k").isNotNull.cast(IntegerType).as("has_k"))
      .orderBy(col("event_id"))
}

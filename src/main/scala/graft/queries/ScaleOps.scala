package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Skew-salted two-phase aggregation (SCALE.md "real cluster" #3 made
    * concrete): `l_returnflag` has THREE values, so the aggregate's final
    * merge concentrates on three reducers no matter how many executors
    * exist. For decomposable aggregates map-side partials already shrink
    * the shuffle, so the plain form survives; the salt is the REQUIRED
    * shape when partials don't combine — holistic aggregates (exact
    * percentile, collect_list), where the hot key's entire value buffer
    * lands on one reducer and AQE has no rewrite (proven plan-level in
    * AqeSkewSpec). The salted form shuffles on (key, salt) first — 32×
    * more, uniformly loaded, partitions — computes partial aggregates
    * there, then re-aggregates the ≤ |keys|×32 partial rows on the key
    * alone. Exact for any decomposable aggregate (count/sum/min/max),
    * which is why it can hash-match the plain GROUP BY oracle; a holistic
    * aggregate needs a mergeable sketch instead (approx_percentile —
    * ApproxSpec's documented trade). The salt is derived (l_orderkey mod
    * 32) rather than rand() so the plan stays deterministic, but ANY salt
    * gives the same answer — the final re-agg collapses it.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val SaltBuckets = 32
    Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(SaltBuckets)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_quantity").cast(DecimalType(12, 2))).as("pq"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("pp"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("pn")).as("n_rows"),
        sum(col("pq")).cast(DoubleType).as("sum_qty"),
        sum(col("pp")).cast(DoubleType).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Skew-salted JOIN (the join-side counterpart of [[saltedAgg]]): when
    * one join key's rows exceed an executor's partition budget, salt the
    * FACT side with a value derived from NON-key columns (so rows of the
    * same key spread over `SaltBuckets` partitions) and replicate the
    * other side once per salt (explode × SaltBuckets — bounded, it is the
    * smaller side). The join becomes an equi-join on (key, salt): same
    * matches, uniformly loaded partitions. Exact — hash-matches the plain
    * join oracle — so applying it to a hot key is a plan change, not a
    * semantics change. (AQE's OptimizeSkewedJoin does this automatically
    * for sort-merge/shuffled-hash joins, demonstrated plan-level in
    * AqeSkewSpec — including post-filter skew, since it reads the shuffle's
    * own map-output stats. The manual form remains for what AQE provably
    * can't fix: skew under a HOLISTIC aggregate (no join to split —
    * AqeSkewSpec's second half), row skew hidden from the byte-based
    * detection by highly compressible hot-key data, and plans that must
    * stay deterministic across runs.)
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val SaltBuckets = 8
    // coalesce: a NULL salt-source column must not drop the row (NULL salt
    // never equi-matches) — the rewrite stays exact on nullable inputs
    val fact = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(
        coalesce(col("l_partkey"), lit(0L)) + coalesce(col("l_suppkey"), lit(0L)),
        lit(SaltBuckets)))
    val dim = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(array((0 until SaltBuckets).map(lit(_)): _*)))
    fact.join(dim,
        col("l_orderkey") === col("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** Exact grouped quantiles (p25/p50/p75 of order totals per priority).
    * Both engines define the continuous quantile identically — sort, index
    * p·(n−1), linear interpolation a + (b−a)·frac in doubles — so the
    * values hash-match exactly. Exact percentile is a full per-group sort;
    * the documented 100 TB escape hatch is `approx_percentile` (t-digest,
    * mergeable, one pass), the same trade as exact-vs-HLL countDistinct
    * (SCALE.md, Aggregation).
    */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("price", col("o_totalprice").cast(DoubleType))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        percentile(col("price"), lit(0.25)).as("p25"),
        percentile(col("price"), lit(0.5)).as("p50"),
        percentile(col("price"), lit(0.75)).as("p75"))
      .orderBy(col("o_orderpriority"))

  /** Per-group winsorization: every event's `value` clipped to its
    * event type's exact [p05, p95] — the outlier-capping normalization a
    * feature pipeline applies before aggregation or training so one
    * corrupt sensor reading cannot dominate a sum. Composes the exact
    * percentile aggregate of [[quantiles]] with a bounds join back onto
    * the stream: the bounds frame is GROUP-CARDINALITY rows (5 event
    * types here; always small relative to events), so the join
    * broadcasts and clipping is map-side — the fact table never
    * shuffles. The exact percentile itself is the scale cost (holistic,
    * needs the group's values together — the AqeSkewSpec-documented
    * salt-or-sketch case); the approx-percentile escape hatch for
    * monstrous groups is demonstrated in ApproxSpec.
    *
    * A NULL value stays NULL with a NULL clip flag (explicit CASE in
    * both engines — Spark's and DuckDB's least/greatest both SKIP nulls
    * rather than propagate them, which would silently clip a NULL to
    * the bound).
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val bounds = e.groupBy(col("event_type")).agg(
      percentile(col("value"), lit(0.05)).as("lo"),
      percentile(col("value"), lit(0.95)).as("hi"))
    e.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(bounds), Seq("event_type"))
      .withColumn("clipped",
        when(col("value").isNotNull,
          least(greatest(col("value"), col("lo")), col("hi"))))
      .withColumn("is_clipped", col("value") < col("lo") || col("value") > col("hi"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("lo"), col("hi"), col("clipped"), col("is_clipped"))
      .orderBy(col("event_id"))
  }

  /** Morton (z-order) clustering keys over orders: customer key × days
    * since epoch start, quantized to the full 16-bit range from observed
    * min/max, then bit-interleaved ([[graft.olap.Layout.zOrderKey]]). The
    * quantize-first step honors zOrderKey's documented domain contract for
    * ANY key width (ADVICE r6: raw o_custkey exceeds 65535 at SF≳0.5 and
    * would wrap, interleaving unrelated rows) — the bounds are a 1-row
    * aggregate broadcast-crossed into the scan (the q_gapfill/q_decay_score
    * shape: the "nested loop" side is one row by construction), so the
    * whole entry stays one declarative plan the oracle can mirror. The
    * WRITE-side use (range-partition + sort by this key → files with tight
    * min/max on BOTH dims) is demonstrated with measured file stats in
    * LayoutSpec; this entry oracle-pins quantization + interleave
    * arithmetic, since a z-value computed differently by two engines would
    * cluster differently and silently break stat-pruning expectations.
    */
  def zorderKeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
          .cast(LongType).as("dkey"))
    val bounds = o.agg(
      min(col("o_custkey")).cast(LongType).as("a_lo"),
      max(col("o_custkey")).cast(LongType).as("a_hi"),
      min(col("dkey")).as("b_lo"),
      max(col("dkey")).as("b_hi"))
    // same double-arithmetic quantization as Layout.writeZOrdered (see the
    // overflow note there); floor ≡ its toward-zero cast on non-negatives
    def q(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        floor((c.cast(DoubleType) - lo.cast(DoubleType)) * lit(65535.0) /
          (hi.cast(DoubleType) - lo.cast(DoubleType))))
    o.crossJoin(broadcast(bounds))
      .withColumn("zkey", graft.olap.Layout.zOrderKey(
        q(col("o_custkey"), col("a_lo"), col("a_hi")),
        q(col("dkey"), col("b_lo"), col("b_hi"))))
      .select(col("o_orderkey"), col("o_custkey"), col("dkey"), col("zkey"))
      .orderBy(col("o_orderkey"))
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

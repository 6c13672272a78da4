package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Behavioral analytics over the event stream — the funnel / cohort /
  * drift-monitor family a product-analytics engine ships and a training-
  * data pipeline reuses to watch its own ingest (is today's source mix
  * drifting from the corpus baseline?). All three are chained hash
  * aggregates on `user_id`/day keys: the per-user reductions happen
  * FIRST, so every join after them carries O(users)/O(days) rows, not
  * O(events) — the property that keeps them linear at 100 TB.
  */
object BehaviorOps {

  /** Staged conversion funnel (signup → click → purchase), strictly
    * time-ordered per user: each stage's timestamp must be strictly
    * after the previous stage's (ties at microsecond grain do not
    * convert). Per stage: users reaching it and the mean microseconds
    * from the previous stage.
    *
    * Each stage is filter → join on the previous stage's per-user frame
    * → min-aggregate; the reduced frames are O(users), shrink
    * monotonically, and Catalyst broadcasts them into the fact scans at
    * small scale (the observed plan) or SMJs them on the shared user_id
    * key past the broadcast threshold. Deltas are summed as exact long
    * microseconds (both
    * engines' integer AVG is sum/count — order-independent), then one
    * division, so the doubles hash-match.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t3"), min(col("t2")).as("t2"))
    def stage(n: Int, name: String, df: DataFrame, delta: Column): DataFrame =
      df.agg(count(lit(1)).as("n_users"), avg(delta).as("avg_delta_us"))
        .select(lit(n).as("stage"), lit(name).as("stage_name"),
          col("n_users"), col("avg_delta_us"))
    stage(1, "signup", s1, lit(null).cast(LongType))
      .unionAll(stage(2, "click", s2, unix_micros(col("t2")) - unix_micros(col("t1"))))
      .unionAll(stage(3, "purchase", s3, unix_micros(col("t3")) - unix_micros(col("t2"))))
      .orderBy(col("stage"))
  }

  /** Weekly retention cohorts: users grouped by their first-activity
    * week, counted per week-offset from that cohort. Week index is pure
    * integer arithmetic (days-since-epoch floor-div 7) — no engine-
    * specific week-truncation semantics to disagree on.
    *
    * Two aggregates on user_id (first week, then the cohort join) and
    * one on the (cohort, offset) grain; the exact COUNT(DISTINCT user)
    * rides the final shuffle. The cohort table is O(users) — at 100 TB
    * the events→cohort join is the standard fact⋈reduced-dim shuffle,
    * bucketable on user_id.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      floor(datediff(to_date(col("ts")), lit("1970-01-01")) / 7)
        .cast(IntegerType).as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-user activity streaks via gaps-and-islands: consecutive active
    * days share a constant (day_index − row_number) island key, so runs
    * fall out of one partitioned window plus two hash aggregates — no
    * self-join, no iteration. The distinct (user, day) reduction comes
    * first, so the window sorts O(active user-days), not O(events), and
    * everything shuffles once on user_id.
    */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island",
        datediff(col("day"), lit("1970-01-01")) - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  /** Per-day distribution-drift monitor: the L∞ distance between each
    * day's event-type mix and the corpus-wide baseline mix. L∞ (max of
    * per-type |share − baseline share|) is chosen over chi-square/TVD
    * deliberately: MAX of doubles is order-independent where a SUM of
    * doubles is not, so the statistic is bit-stable across engines and
    * partitionings. Absent (day, type) cells count as share 0 via the
    * day×type grid, or a quiet day would under-report its drift.
    *
    * Shape: one (day, type) count aggregate feeds everything; the type
    * totals (|types| rows) and grand total (1 row) are aggregate-derived
    * tiny frames broadcast-crossed into the day grid — the sanctioned
    * q_gapfill pattern. Two fact-scans' worth of work total, O(days)
    * output.
    */
  def driftLinf(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("o"))
    val d = c.groupBy(col("day")).agg(sum(col("o")).as("day_total"))
    val t = c.groupBy(col("event_type")).agg(sum(col("o")).as("type_total"))
    val g = t.agg(sum(col("type_total")).as("grand"))
    d.crossJoin(t).crossJoin(g)
      .join(c, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("o"))
      .groupBy(col("day"), col("day_total"))
      .agg(max(abs(
        col("o").cast(DoubleType) / col("day_total") -
          col("type_total").cast(DoubleType) / col("grand"))).as("linf_drift"))
      .select(col("day"), col("day_total").as("n_events"), col("linf_drift"))
      .orderBy(col("day"))
  }

  /** Path length for [[sessionPaths]] — first k steps of each session.
    * Shared with the oracle SQL. */
  private[graft] val PathSteps = 3

  /** Top user-journey prefixes: the most common first-[[PathSteps]]
    * event-type sequences across sessions (30-minute-gap sessions, the
    * same rule as [[graft.streaming.Sessionize]]), with session and
    * unique-user counts — the path-mining view a product team reads
    * next to the funnel (funnel fixes the stage order; this DISCOVERS
    * the orders users actually take).
    *
    * Shape: the gap-sessionize windows (one user_id shuffle), a step
    * rank inside each session, then the path string is an ORDERED
    * collect of ≤[[PathSteps]] types — bounded arrays, the EWMA
    * contract — and one path-keyed count aggregate. Path cardinality is
    * ≤ |types|^k (tiny), so the final aggregate broadcasts nothing and
    * skews nowhere; everything before it rides the one user shuffle.
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(ord)))
      .withColumn("new_session",
        when(col("gap_us").isNull ||
          col("gap_us") > graft.streaming.Sessionize.GapMs * 1000L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(cum))
      .withColumn("step", row_number().over(
        Window.partitionBy(col("user_id"), col("session_seq"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("step") <= PathSteps)
    stepped
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("step"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
  }

  /** Rolling 7-day distinct active users per active day, beside the
    * 1-day count — the sliding-DISTINCT problem: distinct does not
    * decompose over sliding windows (you cannot subtract yesterday's
    * leavers from a running set), so the naive forms are a per-day
    * range self-join (O(days·window) with a nested-loop shape) or a
    * 90-day recount. The scale-correct form used here: each distinct
    * (day, user) row CONTRIBUTES itself to exactly the 7 window
    * anchors it can serve — a bounded ×7 map-side explode, no range
    * join, no skew — then one anchor-keyed exact countDistinct.
    * Fanout = window length, independent of data volume; the
    * approx swap (per-day HLL sketches unioned over the window) is the
    * standard trade when even ×7 is too much.
    */
  def rollingDau(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val anchors = du.select(col("day")).distinct()
    du
      .select(col("day"), col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("g_day"))
      .join(anchors.select(col("day").as("g_day")), Seq("g_day"), "left_semi")
      .groupBy(col("g_day"))
      .agg(
        countDistinct(when(col("day") === col("g_day"), col("user_id")))
          .as("dau_1d"),
        countDistinct(col("user_id")).as("dau_7d"))
      .orderBy(col("g_day"))
  }

  /** |z| threshold for [[abTest]] significance — 95% two-sided. Shared
    * with the oracle SQL. */
  private[graft] val AbZCrit = 1.96

  /** Two-proportion z-test between experiment arms: users are split by
    * `user_id % 2` (the deterministic stand-in for an assignment
    * column), the metric is purchase-rate per event, and the output is
    * ONE row of arm counts, rates, the pooled-variance z statistic, and
    * the 95% verdict — the decision gate an experimentation platform
    * computes over the full event log.
    *
    * The entire test reduces in a single global hash aggregate: the four
    * inputs (events and purchases per arm) are conditional COUNTs, so
    * the map side combines everything and ONE row crosses the wire —
    * at 100 TB this is the cheapest possible shape, a pure scan-reduce
    * with no join and no window. The z arithmetic runs on that one row:
    * every operand derives from exact integer counts, and each +,−,×,/,
    * sqrt is a single correctly-rounded IEEE-754 op mirrored
    * structurally in the oracle SQL, so the statistic matches
    * bit-for-bit (the olsFit fixed-association precedent).
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val isB   = col("user_id") % 2 === 1
    val isBuy = col("event_type") === "purchase"
    def dbl(c: String): Column = col(c).cast(DoubleType)
    Tables.events(spark, dir)
      .agg(
        count(when(!isB, 1)).as("n_a"),
        count(when(!isB && isBuy, 1)).as("conv_a"),
        count(when(isB, 1)).as("n_b"),
        count(when(isB && isBuy, 1)).as("conv_b"))
      .withColumn("p_a", dbl("conv_a") / dbl("n_a"))
      .withColumn("p_b", dbl("conv_b") / dbl("n_b"))
      .withColumn("p_pool",
        (dbl("conv_a") + dbl("conv_b")) / (dbl("n_a") + dbl("n_b")))
      .withColumn("z",
        (col("p_a") - col("p_b")) /
          sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / dbl("n_a") + lit(1.0) / dbl("n_b"))))
      .withColumn("significant", abs(col("z")) > lit(AbZCrit))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        col("p_a"), col("p_b"), col("z"), col("significant"))
  }

  /** Smoothing factor for [[ewma]] — 1/4, chosen EXACTLY representable in
    * binary so both α and 1−α are exact doubles and the fold introduces
    * no constant-rounding divergence. Shared with the oracle SQL. */
  private[graft] val EwmaAlpha = 0.25

  /** Per-user exponentially-weighted moving average of the event value —
    * the classic time-decayed feature (recent behavior outweighs old)
    * that simple windows can't express: EWMA is an ORDERED FOLD
    * `s ← α·x + (1−α)·s`, not an associative sum, so it cannot ride a
    * combining aggregate. The op makes that explicit: values are
    * collected per user in (ts, event_id) order and folded left with the
    * first element as seed — the Spark `aggregate` HOF and DuckDB's
    * `list_reduce` execute the IDENTICAL operation chain, and since α,
    * 1−α, and every intermediate are IEEE doubles under correctly-
    * rounded ×/+, the result hash-matches bit for bit.
    *
    * Scale honesty: the fold is group-LOCAL — state is one double, but
    * the values must be ordered within the group, so the cost is the
    * per-user sort (array of that user's events; bounded by per-entity
    * activity, NOT corpus size — the sessionize trade). The unbounded-
    * history escape hatch is the streaming form: mapGroupsWithState
    * carrying the one-double state forever, no reordering needed because
    * event-time watermarking bounds lateness ([[graft.streaming.Streams]]).
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("value").isNotNull)
    e.groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("value")))).as("seq"))
      .select(
        col("user_id"),
        size(col("seq")).cast(LongType).as("n"),
        aggregate(
          slice(col("seq"), lit(2), size(col("seq")) - 1),
          element_at(col("seq"), 1).getField("value"),
          (acc, s) => lit(EwmaAlpha) * s.getField("value") +
            lit(1.0 - EwmaAlpha) * acc).as("ewma"))
      .orderBy(col("user_id"))
  }

  /** Basket-size ceiling for [[basketPairs]] — baskets with more distinct
    * items are dropped whole before pair formation. Shared with the
    * oracle SQL. */
  private[graft] val MaxBasketItems = 12
  /** Output size of [[basketPairs]]. */
  private[graft] val BasketTopK = 15

  /** Market-basket co-occurrence: which part pairs appear together in
    * the same order, with support and lift — the association-mining
    * primitive behind "frequently bought together" and, in a training-
    * data pipeline, behind co-occurrence embeddings (a PMI matrix is
    * this table plus a log). Top-[[BasketTopK]] pairs by co-count.
    *
    * Pair formation is the quadratic hazard: a basket of b items emits
    * C(b,2) pairs, so one pathological 10⁵-item basket (a crawler
    * artifact, a wholesale account) emits 5·10⁹ rows from a single key.
    * The [[MaxBasketItems]] cap drops oversized baskets BEFORE the
    * self-join — the standard market-basket guard (capped analysis is
    * also statistically cleaner: mega-baskets carry no preference
    * signal) — bounding per-key fan-out at C(12,2)=66. Unlike the
    * df-cap's test-SF headroom, this cap BITES at sf0.1 (max real
    * basket is 17 items): the dropped mass is exercised, not
    * hypothetical. All pre-pair stages — distinct, size count, size
    * filter, the pair self-join itself — key on l_orderkey, so they
    * share ONE exchange; the basket-count frame is a 1-row broadcast, and
    * the item-frequency joins are left to SIZE-based planning (auto-
    * broadcast at test SFs, partitioned at catalog scale) because the
    * item domain grows with the data.
    * Lift = N·c₁₂/(c₁·c₂) is exact int64 products under one double
    * division, mirrored in the oracle.
    */
  def basketPairs(spark: SparkSession, dir: String): DataFrame =
    basketPairsFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))

  /** [[basketPairs]] over any (ok, pk) membership frame — factored so the
    * spec can prove the cap mechanism on a constructed mega-basket. */
  private[graft] def basketPairsFrom(raw: DataFrame): DataFrame = {
    val lp = raw.distinct()
    val sized = lp.groupBy(col("ok")).agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") >= 2 && col("bsize") <= MaxBasketItems)
      .select(col("ok"))
    val items = lp.join(sized, Seq("ok"))
    val itemCnt = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val nBaskets = sized.agg(count(lit(1)).as("n_baskets"))
    items.select(col("ok"), col("pk").as("pk_a"))
      .join(items.select(col("ok"), col("pk").as("pk_b")), Seq("ok"))
      .filter(col("pk_a") < col("pk_b"))
      .groupBy(col("pk_a"), col("pk_b"))
      .agg(count(lit(1)).as("n_co"))
      // the item-count table is CATALOG-scale (it grows with the part
      // domain, not a bounded one), so it is never hint-broadcast
      // (ADVICE r10 class): the planner still auto-broadcasts it by SIZE
      // at test SFs (same plan, same cost), but at 100 TB the estimate
      // exceeds the threshold and the join partitions instead of OOMing
      .join(itemCnt.select(col("pk").as("pk_a"), col("n_item").as("n_a")),
        Seq("pk_a"))
      .join(itemCnt.select(col("pk").as("pk_b"), col("n_item").as("n_b")),
        Seq("pk_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("pk_a"), col("pk_b"), col("n_co"), col("n_a"), col("n_b"),
        ((col("n_baskets") * col("n_co")).cast(DoubleType)
          / (col("n_a") * col("n_b")).cast(DoubleType)).as("lift"))
      .orderBy(col("n_co").desc, col("pk_a"), col("pk_b"))
      .limit(BasketTopK)
  }

  /** Fixed-point scale for [[timeWeighted]] values: 10⁻⁴ units. */
  private[graft] val TwScale = 10000L

  /** Per-user TIME-weighted average of the event value — the metric that
    * answers "what level did this signal HOLD", not "what was the mean
    * reading": each value is weighted by how long it persisted (step
    * interpolation until the next event), so a sensor that idles at 0
    * for a month and spikes for a second averages near 0 regardless of
    * how many spike readings were logged. Per-event means silently
    * overweight chatty periods; every billing/SLA/utilization metric is
    * this shape.
    *
    * One lead() window per user (partitioned — never global) computes
    * each reading's hold duration; the integration is then the exact-
    * moments discipline (olsFit, dsir): value quantized per row to
    * [[TwScale]]ths via floor (identical both engines), duration in
    * whole seconds via integral div of the microsecond delta, and
    * Σ value·duration carried as DECIMAL(38,0) (a year-long hold at
    * 10⁷ scaled units is ~3·10¹⁴ per row — int64 survives here, but not
    * under 100 TB per-user event counts, so the sum is decimal by
    * construction). The average is one final double division. Ties in
    * ts (zero duration) contribute nothing, identically in both
    * engines; each user's LAST reading has no successor and is excluded
    * from the integral (the open-ended hold would need an as-of horizon
    * — a parameter, not a default).
    */
  def timeWeighted(spark: SparkSession, dir: String): DataFrame =
    timeWeightedFrom(Tables.events(spark, dir))

  /** [[timeWeighted]] over any (user_id, ts, event_id, value) frame —
    * factored so the spec can pin the integral on a hand-computed
    * timeline. */
  private[graft] def timeWeightedFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("delta_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("delta_us").isNotNull)
      .withColumn("dur_s", expr("delta_us div 1000000"))
      .withColumn("v_scaled",
        floor(col("value") * lit(TwScale.toDouble)).cast(LongType))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("dur_s")).as("span_s"),
        sum(col("v_scaled").cast(DecimalType(38, 0)) * col("dur_s")).as("vsum"))
      .select(col("user_id"), col("n_spans"), col("span_s"),
        (col("vsum").cast(DoubleType)
          / (lit(TwScale.toDouble) * nullif(col("span_s"), lit(0L)).cast(DoubleType)))
          .as("twa"))
      .orderBy(col("user_id"))
  }

  /** RFM segmentation — the classic customer-value grid: per customer,
    * Recency (days from last order to the corpus horizon), Frequency
    * (order count), and Monetary (exact total cents) are each scored
    * into quartiles against the EXACT population quantiles, and the
    * output is the occupancy of the (r, f, m) score grid (≤ 64 cells)
    * with its value mass — the segmentation a retention/quota planner
    * consumes directly (a mixture sampler reads it the same way:
    * "whales", "churn-risk", "one-shots" are cells of this grid).
    *
    * Scale shape: one O(customers) reduction from the fact table, one
    * 1-row exact-quantile aggregate broadcast-crossed back (the
    * equidepth boundary pattern — scores are then THREE map-side
    * comparisons per metric), one final ≤64-cell aggregate. Horizon =
    * max order date, a second 1-row broadcast (the decay-score shape) —
    * a pipeline would pass "today"; deriving it keeps the entry
    * self-contained. Quartile boundaries are interpolated doubles from
    * integer inputs — identical interpolation both engines (the
    * quantiles precedent); scores use > on (long, double), a single
    * correctly-rounded comparison. Higher score = better: R counts
    * boundaries the customer is UNDER (recent), F/M boundaries they are
    * OVER.
    */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("od")).as("last_od"), count(lit(1)).as("f"), sum(col("cents")).as("m"))
    val horizon = perCust.agg(max(col("last_od")).as("h"))
    val r = perCust.crossJoin(broadcast(horizon))
      .withColumn("rec_days", datediff(col("h"), col("last_od")).cast(LongType))
    val qs = typedLit(Seq(0.25, 0.5, 0.75))
    val bounds = r.agg(
      percentile(col("rec_days"), qs).as("rb"),
      percentile(col("f"), qs).as("fb"),
      percentile(col("m"), qs).as("mb"))
    def over(v: String, b: String): Column = (1 to 3)
      .map(i => (col(v) > element_at(col(b), i)).cast(IntegerType))
      .reduce(_ + _)
    r.crossJoin(broadcast(bounds))
      .select(
        (lit(4) - over("rec_days", "rb")).cast(LongType).as("r_score"),
        (lit(1) + over("f", "fb")).cast(LongType).as("f_score"),
        (lit(1) + over("m", "mb")).cast(LongType).as("m_score"),
        col("m"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"), sum(col("m")).as("total_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Audience-overlap matrix: for every pair of event types, the Jaccard
    * similarity of their USER sets — "do purchasers also click?", the
    * audience-composition statistic behind both cross-sell analysis and
    * training-mixture design (two sources whose contributor sets overlap
    * heavily add less diversity than their row counts suggest).
    *
    * The pair-forming join keys on user_id, and per-user fan-out is
    * C(types-per-user, 2) ≤ C(|types|, 2) — bounded by the SMALL
    * dimension's cardinality squared, not by data volume, which is what
    * makes a self-join safe here and fatal on an unbounded key (the
    * dedup tier's band-bucket discipline, with the type set as a
    * natural band). Set sizes are group-cardinality and broadcast;
    * |A∪B| = |A|+|B|−|A∩B| keeps everything integer until one final
    * division.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tu = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    tu.select(col("event_type").as("type_a"), col("user_id"))
      .join(tu.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        (col("n_both").cast(DoubleType)
          / (col("n_a") + col("n_b") - col("n_both")).cast(DoubleType)).as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** First-order Markov transition matrix over the per-user event
    * sequence: P(next = b | current = a) with counts — the model behind
    * next-action prediction, and the statistic that turns
    * [[sessionPaths]]' raw journeys into a generator. Uses the FULL
    * per-user timeline (ties broken by event_id, the repo-wide total
    * order); a production variant conditions on session boundaries —
    * the gap rule is one extra window column away.
    *
    * One lead() window per user (partitioned, never global), one hash
    * aggregate to the ≤|types|² transition cells, and the row totals
    * come from a window over that tiny cell frame — no second scan.
    * Counts are exact; the probability is one division per cell.
    */
  def markovNext(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val rowW = Window.partitionBy(col("cur"))
    cells
      .withColumn("row_total", sum(col("n")).over(rowW))
      .select(col("cur"), col("nxt"), col("n"),
        (col("n").cast(DoubleType) / col("row_total").cast(DoubleType)).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** Cohort LTV triangle: customers grouped by FIRST-order month, then
    * each cohort's revenue tracked by month-offset from acquisition —
    * cumulative cents per cohort member is the lifetime-value curve
    * that prices acquisition and, in a data pipeline, values a source
    * over time rather than by its day-one volume. The [[retention]]
    * shape applied to money instead of presence.
    *
    * Month index is pure integer arithmetic (year·12+month — no engine
    * month-diff semantics), revenue is exact integer cents, the
    * cumulative column is an integer ROWS-frame cumsum per cohort (the
    * pareto discipline), and the per-member average is one final
    * division. Scale shape: one O(customers) first-order reduction
    * joined back on the shared o_custkey key, then an O(cohorts ×
    * offsets) aggregate — the output triangle is calendar², tiny at
    * any volume.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(to_date(col("o_orderdate"))) * 12 + month(to_date(col("o_orderdate"))))
          .cast(LongType).as("m_idx"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("cents"))
    val firstM = o.groupBy(col("o_custkey")).agg(min(col("m_idx")).as("cohort_m"))
    val sizes = firstM.groupBy(col("cohort_m")).agg(count(lit(1)).as("n_customers"))
    val cells = o.join(firstM, Seq("o_custkey"))
      .groupBy(col("cohort_m"), (col("m_idx") - col("cohort_m")).as("offset_m"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_m")).orderBy(col("offset_m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sizes), Seq("cohort_m"))
      .withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .select(col("cohort_m"), col("offset_m"), col("n_customers"),
        col("rev_cents"), col("cum_cents"),
        (col("cum_cents").cast(DoubleType) / col("n_customers").cast(DoubleType))
          .as("ltv_cents"))
      .orderBy(col("cohort_m"), col("offset_m"))
  }

  /** Customers whose last order is within this many days of the corpus
    * horizon are CENSORED (still alive) in [[survival]]. Shared with
    * the oracle SQL. */
  private[graft] val SurvCensorDays = 365

  /** Kaplan–Meier survival curve over CUSTOMER lifetimes (first order →
    * last order, in weeks, right-censored within a year of the horizon)
    * — the churn statistic done correctly: simply averaging observed
    * lifetimes biases toward early churners, because the still-active
    * customers haven't finished theirs; KM weights each death week by
    * who was actually still at risk. Output: per death week, the
    * at-risk count, deaths, and S(t) = Π_{tᵢ≤t} (1 − dᵢ/rᵢ).
    *
    * Scale shape: one O(customers) reduction, a 1-row horizon broadcast
    * (decay-score shape), and an at-risk count via a broadcast
    * theta-join whose build side is the DISTINCT DEATH WEEKS — bounded
    * by the calendar window (≤ ~360 over seven years), never by the
    * customer count. The survival product is an ordered fold — like
    * EWMA/chi-square, NOT an associative sum — so the week terms
    * (calendar-bounded) collect into ONE row and each week's S(t) is a
    * pinned left-fold product over its prefix: Spark `aggregate` seeded
    * 1.0 and DuckDB `list_reduce` seeded by the first factor run the
    * identical multiplication chain (1.0·f₁ ≡ f₁ exactly), so even this
    * float curve hash-matches. The prefix re-folds are O(weeks²) lambda
    * evaluations in one task — ~10⁵ at the calendar bound, irrelevant
    * beside any scan.
    */
  def survival(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("o_orderdate"))).as("last_d"))
    val horizon = perCust.agg(max(col("last_d")).as("hz"))
    val lives = perCust.crossJoin(broadcast(horizon))
      .withColumn("lifetime_w", expr("datediff(last_d, first_d) div 7"))
      .select(col("lifetime_w").cast(LongType).as("lifetime"),
        (datediff(col("hz"), col("last_d")) < SurvCensorDays).as("censored"))
    val deaths = lives.filter(!col("censored"))
      .groupBy(col("lifetime").as("week")).agg(count(lit(1)).as("d"))
    val atRisk = lives
      .join(broadcast(deaths.select(col("week"))), col("lifetime") >= col("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("r"))
    deaths.join(atRisk, Seq("week"))
      .agg(sort_array(collect_list(struct(col("week"), col("d"), col("r")))).as("arr"))
      .select(col("arr"), posexplode(col("arr")).as(Seq("i", "t")))
      .select(col("t.week").as("week"), col("t.d").as("deaths"), col("t.r").as("at_risk"),
        expr("""aggregate(
            transform(slice(arr, 1, i + 1),
              x -> 1.0d - CAST(x.d AS DOUBLE) / CAST(x.r AS DOUBLE)),
            1.0d, (acc, f) -> acc * f)""").as("survival"))
      .orderBy(col("week"))
  }

  /** Seasonal-baseline anomaly detection: a (day-of-week, hour-of-day)
    * baseline of the event value — mean and standard deviation per
    * seasonal cell — with each reading flagged against ITS OWN cell's
    * 3σ envelope; the output is the 7×24 baseline grid with per-cell
    * anomaly counts. This is the monitoring shape for any diurnal
    * signal (traffic, latency, ingest volume): a Tuesday-3am reading is
    * judged against Tuesday-3am history, not a global mean that diurnal
    * swing would inflate into uselessness.
    *
    * Exactness discipline end to end: day-of-week is integer calendar
    * arithmetic (days-since-1970-01-01 mod 7 — the two engines number
    * weekdays differently, so neither's dayofweek() is used), values
    * quantize to [[TwScale]]ths via floor, and the baseline moments
    * (n, Σv, Σv²) are exact integer/decimal sums — Σv² rides
    * DECIMAL(38,0): a 10⁷-scaled reading squares to 10¹⁴ and int64 dies
    * within a few 10⁴ rows of that at corpus scale. Mean and σ² =
    * (n·Σv² − (Σv)²)/n² are fixed-association doubles from those exact
    * integers, σ is one correctly-rounded sqrt, and the 3σ test
    * compares doubles derived identically in both engines. Scale shape:
    * one aggregate to a ≤168-row grid, broadcast back onto the scan,
    * flag+count map-side — the winsorize bounds-join pattern, two scans
    * total (a production run would fold both into one pass with a
    * grouping-sets aggregate; two keeps the baseline frame reusable).
    */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(
        pmod(datediff(to_date(col("ts")), lit("1970-01-01")), lit(7))
          .cast(LongType).as("dow"),
        hour(col("ts")).cast(LongType).as("hr"),
        floor(col("value") * lit(TwScale.toDouble)).cast(LongType).as("v"))
    val base = e.groupBy(col("dow"), col("hr"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("sv"),
        sum(col("v").cast(DecimalType(38, 0)) * col("v")).as("svv"))
      .withColumn("mean_scaled", dbl("sv") / dbl("n"))
      .withColumn("var_scaled",
        (dbl("n") * dbl("svv") - dbl("sv") * dbl("sv")) / (dbl("n") * dbl("n")))
      .withColumn("sd_scaled", sqrt(col("var_scaled")))
    e.join(broadcast(base), Seq("dow", "hr"))
      .groupBy(col("dow"), col("hr"), col("n"), col("mean_scaled"), col("sd_scaled"))
      .agg(count(when(
        abs(col("v").cast(DoubleType) - col("mean_scaled"))
          > lit(3.0) * col("sd_scaled"), 1)).as("n_anomalies"))
      .select(col("dow"), col("hr"), col("n"),
        (col("mean_scaled") / lit(TwScale.toDouble)).as("mean_value"),
        (col("sd_scaled") / lit(TwScale.toDouble)).as("sd_value"),
        col("n_anomalies"))
      .orderBy(col("dow"), col("hr"))
  }

  /** χ² critical value at p=0.05 for 4 degrees of freedom — the (arms−1)
    * ×(types−1) of this contingency table. Shared with the oracle SQL. */
  private[graft] val ChisqCrit = 9.487729036781154

  /** Chi-square independence test over the arm × event-type contingency
    * table — [[abTest]]'s k-ary sibling: does the event-type MIX differ
    * between arms, not just one conversion rate? Observed counts are one
    * hash aggregate; expected counts E = row·col/N come from two
    * group-cardinality broadcasts plus the 1-row grand total (the
    * sanctioned driftLinf grid shape).
    *
    * The statistic is Σ(O−E)²/E over all cells — a SUM of doubles, which
    * is order-DEPENDENT, so the op pins the order instead of praying:
    * per-cell terms are collected and sorted by (arm, type), then folded
    * left — Spark's `aggregate` over `sort_array` and DuckDB's
    * `list_reduce` over `list(... ORDER BY ...)` run the same addition
    * chain, making even this float statistic hash-exact. Cell count is
    * arms×types (tiny at any corpus size), so the collect is O(1).
    */
  def chisq(spark: SparkSession, dir: String): DataFrame = {
    def dbl(c: Column): Column = c.cast(DoubleType)
    val cells = Tables.events(spark, dir)
      .select((col("user_id") % 2).cast(LongType).as("arm"), col("event_type"))
      .groupBy(col("arm"), col("event_type")).agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("arm")).agg(sum(col("o")).as("rt"))
    val colT = cells.groupBy(col("event_type")).agg(sum(col("o")).as("ct"))
    val grand = colT.agg(sum(col("ct")).as("n"))
    val terms = cells
      .join(broadcast(rowT), Seq("arm"))
      .join(broadcast(colT), Seq("event_type"))
      .crossJoin(broadcast(grand))
      .withColumn("e", dbl(col("rt")) * dbl(col("ct")) / dbl(col("n")))
      .withColumn("term",
        (dbl(col("o")) - col("e")) * (dbl(col("o")) - col("e")) / col("e"))
    val folded = terms.agg(
      min(col("n")).as("n_events"),
      count(lit(1)).as("n_cells"),
      ((countDistinct(col("arm")) - 1) * (countDistinct(col("event_type")) - 1))
        .as("dfree"),
      sort_array(collect_list(struct(col("arm"), col("event_type"), col("term"))))
        .as("ts"))
    folded.select(
      col("n_events"), col("n_cells"),
      aggregate(
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        element_at(col("ts"), 1).getField("term"),
        (acc, s) => acc + s.getField("term")).as("chisq"),
      col("dfree").as("df"))
      .withColumn("significant", col("chisq") > lit(ChisqCrit))
  }

  // ------------------------------------------------- item-item neighbors
  /** Item universe cap and neighbor count for [[itemCf]]. */
  private[graft] val CfTopItems  = 20
  private[graft] val CfNeighbors = 5
  /** Fixed-point scale for the quantized cosine. */
  private[graft] val CfScale = 1L << 20

  /** Item-item collaborative filtering: for each of the [[CfTopItems]]
    * most-ordered parts, its top-[[CfNeighbors]] neighbors by binary
    * cosine similarity co/√(nₐ·n_b) over co-membership in capped baskets
    * — the "customers also bought" table. The cosine is quantized to
    * [[CfScale]] fixed-point with every input exact (co·scale and nₐ·n_b
    * are integers below 2⁵³, so the double division and √ are each one
    * correctly-rounded IEEE op — identical in any engine).
    *
    * Shape: the basket-cap guard BEFORE any pair stage, then the
    * TOP-ITEM PRUNE ALSO BEFORE PAIR FORMATION — the probe side of the
    * pair join is the basket memberships of the [[CfTopItems]] asked
    * about (a left-semi broadcast against the top set), so per-basket
    * work is |top∩basket|·|basket|, not |basket|²: the neighbor lists
    * of a trillion-pair co-matrix are only ever counted for the probe
    * items (measured 3.9 s → 2.3 s at sf0.1 vs the count-then-prune
    * shape; what remains is the shared basket-dedup/cap pass every
    * family member pays). Degrees join from the items-scale count
    * table; ranking is a window partitioned by item.
    */
  def itemCf(spark: SparkSession, dir: String): DataFrame =
    itemCfFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))

  /** [[itemCf]] over any (ok, pk) membership frame — factored for the
    * hand-drawn fixture spec. */
  private[graft] def itemCfFrom(raw: DataFrame): DataFrame = {
    val lp = raw.distinct()
    val sized = lp.groupBy(col("ok")).agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") >= 2 && col("bsize") <= MaxBasketItems)
      .select(col("ok"))
    val items = lp.join(sized, Seq("ok"))
    val itemCnt = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val top = itemCnt.orderBy(col("n_item").desc, col("pk"))
      .limit(CfTopItems).select(col("pk"))
    val probe = items.join(broadcast(top), Seq("pk"), "left_semi")
    val sym = probe.select(col("ok"), col("pk").as("item"))
      .join(items.select(col("ok"), col("pk").as("nbr")), Seq("ok"))
      .filter(col("item") =!= col("nbr"))
      .groupBy(col("item"), col("nbr")).agg(count(lit(1)).as("n_co"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos_q").desc, col("n_co").desc, col("nbr"))
    sym
      // catalog-scale degree table: size-based join choice, never a hint
      // (the basketPairs de-broadcast rationale)
      .join(itemCnt.select(col("pk").as("item"), col("n_item").as("n_i")),
        Seq("item"))
      .join(itemCnt.select(col("pk").as("nbr"), col("n_item").as("n_n")),
        Seq("nbr"))
      .withColumn("cos_q",
        floor((col("n_co") * CfScale).cast(DoubleType)
          / sqrt((col("n_i") * col("n_n")).cast(DoubleType)) + lit(0.5))
          .cast(LongType))
      .withColumn("cf_rank", row_number().over(w))
      .filter(col("cf_rank") <= CfNeighbors)
      .select(col("item"), col("cf_rank"), col("nbr"), col("n_co"), col("cos_q"))
      .orderBy(col("item"), col("cf_rank"))
  }

  // --------------------------------------------------- touch attribution
  /** Conversion / touch channel constants for [[attribution]]. */
  private[graft] val AttrConvType = "purchase"
  private[graft] val AttrTouch: Seq[(String, Int)] =
    Seq("click" -> 1, "view" -> 2, "signup" -> 3)
  private[graft] val AttrLookbackDays = 7L

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent preceding touch event (click/view/signup) within a
    * [[AttrLookbackDays]]-day lookback, else to "none" — the classic
    * marketing-attribution reduction. Per-channel conversion counts and
    * exact-cents revenue.
    *
    * The whole op is ONE window over the per-user event stream — no
    * self-join: every touch row encodes (rank-in-user, epoch-day,
    * channel-code) into a single int64 (rank·2²¹ + day·8 + code; the
    * rank is monotone in the window order, so a running MAX is exactly
    * "latest preceding touch"), purchases decode the day and code back
    * out, and the lookback is an integer day difference. That makes the
    * plan one Exchange on user_id + one sort, the same cost envelope as
    * sessionization, with the final aggregate map-side combinable to
    * |channels|+1 rows. Revenue sums are integer cents (the repo-wide
    * exact-decimal discipline).
    *
    * Encode domain: the packed day field is 18 bits relative to
    * 1970-01-01, i.e. ts in [1970-01-01, 2687-08-08). A timestamp
    * outside that range would silently corrupt both the running-max
    * ordering and the day decode, so the encode asserts the domain
    * per row (`assert_true`) and fails the job loudly instead.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val code = AttrTouch.tail.foldLeft(
      when(col("event_type") === AttrTouch.head._1, lit(AttrTouch.head._2))) {
      case (acc, (t, c)) => acc.when(col("event_type") === t, lit(c))
    }
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        (datediff(col("ts").cast(DateType), lit("1970-01-01").cast(DateType))
          .cast(LongType)
          // the +coalesce(assert_true...) rider keeps the domain check
          // inside the day expression so column pruning can't drop it;
          // it contributes exactly 0 on every in-domain row
          + coalesce(
            assert_true(
              datediff(col("ts").cast(DateType), lit("1970-01-01").cast(DateType))
                .between(0, (1L << 18) - 1),
              concat(lit("attribution: ts outside the 18-bit epoch-day "
                + "encode domain [1970-01-01, 2687-08-08): "), col("ts").cast(StringType)))
              .cast(LongType),
            lit(0L))).as("day"),
        col("value"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val enc = e
      .withColumn("rn", row_number().over(ord).cast(LongType))
      .withColumn("touch_enc",
        when(code.isNotNull, col("rn") * lit(1L << 21) + col("day") * 8 + code))
      .withColumn("last_touch", max(col("touch_enc"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val channel = when(col("last_touch").isNull
        || col("day") - (expr("last_touch div 8") % lit(1L << 18)) > AttrLookbackDays,
        lit("none"))
      .otherwise(AttrTouch.foldLeft(lit(null).cast(StringType)) {
        case (acc, (t, c)) =>
          when(col("last_touch") % 8 === c, lit(t)).otherwise(acc)
      })
    enc.filter(col("event_type") === AttrConvType)
      .select(channel.as("channel"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("cents")).as("revenue_cents"))
      .orderBy(col("channel"))
  }

  // --------------------------------------------- Markov next-event backtest
  /** Holdout evaluation of the [[markovNext]] transition model — the
    * model put to WORK and measured (the langid_eval discipline): each
    * user's LAST transition is held out, the row-argmax of the
    * transition counts trained on everything else predicts its target,
    * and per-state accuracy comes out beside the prediction. The
    * backtest a pipeline runs before trusting next-event predictions
    * for prefetching or session-abandonment scoring.
    *
    * Scale shape: one user-partitioned lead/rank window pass builds all
    * transitions and marks each user's last (a second aggregate over
    * the SAME window partition — no extra Exchange); train counts are a
    * |states|² aggregate; the argmax is a min-struct combining
    * aggregate ((count DESC, next ASC) — deterministic, never hash
    * order); the test join broadcasts the |states|-row prediction
    * table. A state unseen in training predicts NULL and scores a miss.
    */
  def markovEval(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    val tr = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"),
        row_number().over(w).as("rn"))
      .filter(col("nxt").isNotNull)
      .withColumn("is_test", col("rn") === max(col("rn")).over(wAll))
    val train = tr.filter(!col("is_test"))
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val pred = train.groupBy(col("cur"))
      .agg(min(struct((-col("n")).as("negn"), col("nxt"))).as("p"))
      .select(col("cur"), col("p.nxt").as("pred"))
    tr.filter(col("is_test"))
      .join(broadcast(pred), Seq("cur"), "left")
      .groupBy(col("cur"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nxt") === col("pred"), 1L).otherwise(0L)).as("n_hits"))
      .withColumn("accuracy",
        col("n_hits").cast(DoubleType) / col("n_test").cast(DoubleType))
      .orderBy(col("cur"))
  }

  // ------------------------------------- Markov removal-effect attribution
  /** Fixed-point scale for [[markovRemoval]]'s quantized transition
    * probabilities and conversion values (2^20 — the AaScale class). */
  private[graft] val MarkovRemScale = 1L << 20
  /** Value-iteration rounds — conversion probability within this many
    * steps; shared with the unrolled oracle CTE chain. */
  private[graft] val MarkovRemIters = 8

  /** Markov removal-effect attribution (Anderl et al. 2014 — the
    * data-driven alternative to [[attribution]]'s last-touch and
    * [[firstTouch]]'s first-touch rules): user journeys become a
    * first-order Markov chain over channel states with absorbing CONV
    * (purchase) and NULL (journey end) states, a channel's REMOVAL
    * EFFECT is how much the chain's START→CONV probability drops when
    * that channel is switched off, and attribution shares are the
    * normalized effects. The one attribution scheme that credits a
    * channel by its causal necessity in the graph rather than by its
    * position in the path.
    *
    * Journeys: per-user timelines split AFTER each purchase (the
    * classical path definition — a conversion closes its journey and
    * the next event opens a fresh one); START precedes each journey's
    * first event; a journey ending without purchase transits to NULL.
    * Removing channel c needs NO matrix rebuild: in the value
    * iteration v(s) = Σ_t P(s,t)·v(t), turning c off IS forcing
    * v(c) = 0 (any path through c fails) — so all scenarios (full + one
    * per channel) share one quantized matrix and iterate together,
    * keyed by (scenario, state).
    *
    * Engine-exact by construction: P quantizes to integers
    * (n·[[MarkovRemScale]] div row_total), each round is an integer
    * dot product with one truncating div (Q·v ≤ 2^40·|states| — int64
    * headroom), and both removal_effect and attribution divide exact
    * integers (the effect SUM is integer, never a float fold).
    *
    * Scale shape: the corpus-scale work is ONE user-partitioned window
    * pass (the purchase-count segmentation and the lead ride the same
    * partition ordering) reduced to a ≤|states|²-cell matrix — which is
    * a MODEL ARTIFACT bounded by the event-type domain, not the data
    * (the Lloyd-centroid collect class), so the value iteration runs
    * driver-side over the collected cells instead of paying 8×|scenarios|
    * micro-jobs for frames a few dozen rows wide (measured: the
    * in-engine localCheckpoint loop cost ~2.4 s of pure scheduling at
    * sf0.1). A chain whose state space genuinely scaled with the data
    * would swap the iteration back to the prRanks-style join loop;
    * the `require` bound fails loudly before any such corpus collects.
    * Output is |channels| rows.
    */
  def markovRemoval(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val segW = ord.rowsBetween(Window.unboundedPreceding, -1)
    val state = when(col("event_type") === "purchase", lit("CONV"))
      .otherwise(col("event_type"))
    val x = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), state.as("s"),
        coalesce(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(segW), lit(0L)).as("seg"))
    val jw = Window.partitionBy(col("user_id"), col("seg"))
      .orderBy(col("ts"), col("event_id"))
    val st = x.select(col("s"),
      row_number().over(jw).as("rn"),
      lead(col("s"), 1).over(jw).as("nxt"))
    val tr = st.filter(col("rn") === 1)
      .select(lit("START").as("cur"), col("s").as("nxt"))
      .unionByName(st.filter(col("s") =!= "CONV")
        .select(col("s").as("cur"), coalesce(col("nxt"), lit("NULL")).as("nxt")))
    val cells = tr.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val qcells = cells
      .join(cells.groupBy(col("cur")).agg(sum(col("n")).as("nt")), Seq("cur"))
      .select(col("cur"), col("nxt"),
        expr(s"(n * $MarkovRemScale) div nt").as("q"))
    val cellArr = qcells.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cellArr.length <= 4096,
      s"markovRemoval: ${cellArr.length} transition cells — state space " +
        "outgrew the driver-side iteration; swap in the join-loop form")
    val states = cellArr.map(_._1).distinct.sorted
    val chans = states.filter(_ != "START")
    // K rounds of v(s) <- (Σ_t Q(s,t)·vv(t)) div S with CONV=S, NULL=0,
    // and the removed channel (if any) forced to 0 — exact int64
    // throughout (Q·vv <= 2^40, summed over <= |states|+2 targets)
    def iterate(blocked: Option[String]): Long = {
      var v = Map.empty[String, Long].withDefaultValue(0L)
      for (_ <- 1 to MarkovRemIters) {
        v = states.map { s =>
          val sum = cellArr.iterator.filter(_._1 == s).map { case (_, t, q) =>
            val vv =
              if (t == "CONV") MarkovRemScale
              else if (t == "NULL" || blocked.contains(t)) 0L
              else v(t)
            q * vv
          }.sum
          s -> sum / MarkovRemScale
        }.toMap.withDefaultValue(0L)
      }
      v("START")
    }
    val vf = iterate(None)
    val effs = chans.map(c => (c, iterate(Some(c))))
    val te = effs.map { case (_, vr) => vf - vr }.sum
    import spark.implicits._
    effs.map { case (c, vr) =>
      (c, vf, vr,
        if (vf == 0L) None else Some((vf - vr).toDouble / vf.toDouble),
        if (te == 0L) None else Some((vf - vr).toDouble / te.toDouble))
    }.toSeq
      .toDF("channel", "conv_full_q", "conv_removed_q",
        "removal_effect", "attribution")
      .orderBy(col("channel"))
  }

  // ----------------------------------------------- CF holdout evaluation
  /** Leave-one-out holdout evaluation of [[itemCf]] — the recommender
    * measured, not just materialized: the CF neighbor lists train on the
    * EVEN-keyed half of the baskets (an append-stable split, so no
    * test basket leaks into its own neighbor counts), each odd capped
    * test basket holds out its max-id item, and a basket scores a hit
    * when the holdout appears among the CF neighbors of ANY remaining
    * context item. `hit_rate` is over APPLICABLE baskets (context
    * intersects the [[CfTopItems]] modeled items) — the honest
    * denominator; `n_test_baskets` records the raw pool beside it.
    *
    * Scale shape: training is [[itemCfFrom]] on the filtered half; the
    * model is a ≤[[CfTopItems]]·[[CfNeighbors]]-row BROADCAST; test
    * baskets reduce to (basket, holdout, context) in one aggregate +
    * join; hits/applicable are semi-join counts. Output is one row.
    */
  def cfEval(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val cf = itemCfFrom(raw.filter(col("ok") % 2 === 0))
      .select(col("item"), col("nbr"))
    val lp = raw.filter(col("ok") % 2 === 1).distinct()
    val sized = lp.groupBy(col("ok")).agg(count(lit(1)).as("bsize"))
      .filter(col("bsize").between(2, MaxBasketItems)).select(col("ok"))
    val test = lp.join(sized, Seq("ok"), "left_semi")
    val hold = test.groupBy(col("ok")).agg(max(col("pk")).as("holdout"))
    val ctx = test.join(hold, Seq("ok")).filter(col("pk") =!= col("holdout"))
    val recs = ctx.join(broadcast(cf.withColumnRenamed("item", "pk")), Seq("pk"))
      .select(col("ok"), col("holdout"), col("nbr")).distinct()
    val hits = recs.filter(col("nbr") === col("holdout")).select(col("ok")).distinct()
    val app = ctx
      .join(broadcast(cf.select(col("item").as("pk")).distinct()), Seq("pk"), "left_semi")
      .select(col("ok")).distinct()
    hold.agg(count(lit(1)).as("n_test_baskets"))
      .crossJoin(app.agg(count(lit(1)).as("n_applicable")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .withColumn("hit_rate",
        col("n_hits").cast(DoubleType) / col("n_applicable").cast(DoubleType))
  }

  // ------------------------------------------------ first-touch attribution
  /** [[AttrLookbackDays]] expressed in microseconds — the width of
    * [[firstTouch]]'s range frame. */
  private[graft] val AttrLookbackUs = AttrLookbackDays * 86400L * 1000000L

  /** First-touch attribution: each purchase is credited to the user's
    * EARLIEST touch within the [[AttrLookbackDays]]-day lookback — the
    * discovery-channel complement to [[attribution]]'s last-touch view
    * (marketing reads both: first touch finds, last touch closes).
    *
    * Last-touch rode a running MAX because "latest preceding" never
    * needs to expire; "earliest within the window" DOES (the global
    * earliest touch may have aged out while younger in-window touches
    * remain), so this op is ONE RANGE-frame window over the per-user
    * stream ordered by event micros: frame = [now − lookback, now], and
    * min(us·8 + code) inside it IS "earliest in-window touch, smallest
    * channel code on same-instant ties" — both engines share the peer-
    * inclusive RANGE semantics. Still one Exchange on user_id + one
    * sort, no self-join; the aggregate is map-side combinable to
    * |channels|+1 rows.
    *
    * Encode domain: us·8 must stay inside int64 and the %8 decode needs
    * us ≥ 0, so the encode asserts 0 ≤ us < 2⁶⁰ per row (the
    * [[attribution]] assert-rider discipline) and fails loudly on a
    * pre-1970 or absurd-future timestamp instead of silently mis-
    * crediting.
    */
  def firstTouch(spark: SparkSession, dir: String): DataFrame = {
    val code = AttrTouch.tail.foldLeft(
      when(col("event_type") === AttrTouch.head._1, lit(AttrTouch.head._2))) {
      case (acc, (t, c)) => acc.when(col("event_type") === t, lit(c))
    }
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        // +coalesce(assert_true...) rider: keeps the domain check inside
        // the us expression so column pruning can't drop it; adds 0 on
        // every in-domain row
        (unix_micros(col("ts"))
          + coalesce(
            assert_true(unix_micros(col("ts")).between(0L, (1L << 60) - 1),
              concat(lit("firstTouch: ts outside the us*8 encode domain "
                + "[1970, +inf): "), col("ts").cast(StringType))).cast(LongType),
            lit(0L))).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-AttrLookbackUs, 0)
    val enc = when(code.isNotNull, col("us") * 8 + code)
    val channel = when(col("first_touch").isNull, lit("none"))
      .otherwise(AttrTouch.foldLeft(lit(null).cast(StringType)) {
        case (acc, (t, c)) =>
          when(col("first_touch") % 8 === c, lit(t)).otherwise(acc)
      })
    e.withColumn("first_touch", min(enc).over(w))
      .filter(col("event_type") === AttrConvType)
      .select(channel.as("channel"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("cents")).as("revenue_cents"))
      .orderBy(col("channel"))
  }

  // ---------------------------------------------------- interarrival profile
  /** Per-event-type interarrival profile: the gap from each event to the
    * SAME USER's previous event (any type), summarized per type of the
    * later event — the cadence statistic behind session-gap sizing
    * (complementing `q_lateness_profile`'s watermark view and
    * `q_sessionize`'s fixed threshold). Gaps are exact integer
    * microseconds off ONE user-partitioned lag window (never global);
    * the mean is an exact sum/count division and p50/p90 ride the
    * percentile ↔ quantile_cont contract.
    */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap_us"),
        percentile(col("gap_us").cast(DoubleType), typedLit(Seq(0.5, 0.9))).as("ps"))
      .select(col("event_type"), col("n_gaps"),
        (col("sum_gap_us").cast(DoubleType)
          / (col("n_gaps").cast(DoubleType) * lit(1000000.0))).as("mean_secs"),
        (element_at(col("ps"), 1) / lit(1000000.0)).as("p50_secs"),
        (element_at(col("ps"), 2) / lit(1000000.0)).as("p90_secs"))
      .orderBy(col("event_type"))
  }

  // ----------------------------------------------------------- churn summary
  /** Period-over-period churn: users active in the first half of the
    * month vs the second — retained / churned / new counts and the churn
    * rate, the single number above every retention matrix
    * (`q_retention` gives the full triangle; this is its headline).
    * ONE user-level conditional aggregate — per user two any-flags, then
    * a 1-row reduce; no join, no window, no distinct over raw events.
    */
  def churn(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("in_a"))
      .groupBy(col("user_id"))
      .agg(max(col("in_a")).as("a"), max(lit(1L) - col("in_a")).as("b"))
    users.agg(
        sum(col("a")).as("n_active_first"),
        sum(col("b")).as("n_active_second"),
        sum(col("a") * col("b")).as("n_retained"),
        sum(col("a") * (lit(1L) - col("b"))).as("n_churned"),
        sum((lit(1L) - col("a")) * col("b")).as("n_new"))
      .withColumn("churn_rate",
        col("n_churned").cast(DoubleType)
          / nullif(col("n_active_first"), lit(0L)).cast(DoubleType))
  }

  // ------------------------------------------------- funnel time-to-convert
  /** Time-to-convert distribution for the signup→purchase funnel edge:
    * per user, first signup and the first purchase AT OR AFTER it, then
    * the latency percentiles a growth team actually reads (`q_funnel`
    * reports only whether each stage was reached). Deltas are exact
    * integer microseconds; the p50/p90 interpolation is the
    * percentile ↔ quantile_cont contract (equidepth). Shape: two
    * user-keyed combining aggregates, one broadcast join of the
    * user-scale signup table into the purchase stream, a 1-row output —
    * no window, no self-join of raw events.
    */
  def funnelTime(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(broadcast(su), Seq("user_id"))
      .filter(col("us") >= col("s_us"))
      .groupBy(col("user_id"), col("s_us")).agg(min(col("us")).as("p_us"))
      .select(((col("p_us") - col("s_us"))).as("delta_us"))
    val nSign = su.agg(count(lit(1)).as("n_signups"))
    val stats = conv.agg(
      count(lit(1)).as("n_converted"),
      percentile(col("delta_us").cast(DoubleType), typedLit(Seq(0.5, 0.9))).as("ps"))
    nSign.join(broadcast(stats))
      .select(col("n_signups"), col("n_converted"),
        (col("n_converted").cast(DoubleType) / col("n_signups").cast(DoubleType))
          .as("conv_rate"),
        (element_at(col("ps"), 1) / lit(1000000.0)).as("p50_secs"),
        (element_at(col("ps"), 2) / lit(1000000.0)).as("p90_secs"))
  }

  // ------------------------------- sequential probability ratio monitor
  /** SPRT hypothesis rates as exact rationals: H0 p = 9/50, H1 p = 11/50
    * — chosen integer-over-integer so every log-likelihood term is a
    * difference of INTEGER-argument quantized logs. */
  private[graft] val SprtP0 = (9L, 50L)
  private[graft] val SprtP1 = (11L, 50L)
  /** (1−β)/α at α = β = 0.05 — the Wald acceptance boundary ln 19. */
  private[graft] val SprtBoundArg = 19L

  /** Wald's sequential probability ratio test as a day-by-day experiment
    * monitor — the "peeking-safe" companion to [[abTest]]'s one-shot z:
    * per arm (the same user_id parity split) and day, the binomial
    * log-likelihood-ratio increment for conversion rate [[SprtP1]] vs
    * [[SprtP0]] accumulates as an EXACT INTEGER —
    * x·(lnq 11 − lnq 9) + (n−x)·(lnq 39 − lnq 41), all integer log
    * arguments since both hypothesis rates are /50 rationals — and each
    * day carries the running decision against Wald's ±ln 19 boundary
    * (quantized to the same 2^20 grid, so the comparison is
    * integer-exact). Output is the monitoring table an experimenter
    * reads daily: continue, or stop with the hypothesis accepted.
    *
    * Scale shape: the fact reduces to (arm, day) conditional counts in
    * one combining aggregate; the running sum is a window PARTITIONED by
    * arm over day-grain rows (calendar-scale partitions, never row
    * scale). Nothing float crosses rows; the reported llr divides the
    * integer cumsum once.
    */
  /** χ²(1df) 95% critical value × 1000 — the SRM flag compares by
    * integer cross-multiplication, no float gate. */
  private[graft] val SrmChiCritX1000 = 3841L

  /** Sample-ratio-mismatch guardrail for the user_id-parity experiment
    * split: with a 50/50 design, χ² over the two USER counts (the
    * randomization unit — never event counts, which overdispersion
    * inflates) collapses to (n_a − n_b)²/n, an exact integer ratio;
    * the flag compares 1000·(n_a − n_b)² > [[SrmChiCritX1000]]·n by
    * cross-multiplication. A flagged split means assignment itself is
    * broken and every downstream read ([[abTest]], [[sprtMonitor]],
    * CUPED) is void — the FIRST check an experimentation pipeline runs.
    * Shape: one distinct to the user grain, one conditional-count
    * aggregate, a 1-row report.
    */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct()
      .agg(
        sum(when(pmod(col("user_id"), lit(2L)) === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(pmod(col("user_id"), lit(2L)) === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))).cast("double")
          ./((col("n_a") + col("n_b")).cast("double")).as("chi_sq"),
        (lit(1000L) * (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
          lit(SrmChiCritX1000) * (col("n_a") + col("n_b"))).as("srm"))

  def sprtMonitor(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.StatsOps.LogScale
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5))
        .cast(LongType)
    val (p0n, den) = SprtP0
    val (p1n, _)   = SprtP1
    val isBuy = col("event_type") === "purchase"
    val daily = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(pmod(col("user_id"), lit(2L)).cast(IntegerType).as("arm"),
        col("ts").cast(DateType).as("day"), isBuy.as("buy"))
      .groupBy(col("arm"), col("day"))
      .agg(count(lit(1)).as("n"), sum(when(col("buy"), 1L).otherwise(0L)).as("x"))
    val inc = col("x") * (lnq(lit(p1n)) - lnq(lit(p0n))) +
      (col("n") - col("x")) * (lnq(lit(den - p1n)) - lnq(lit(den - p0n)))
    val w = Window.partitionBy(col("arm")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bound = lnq(lit(SprtBoundArg))
    daily
      .withColumn("cum", sum(inc).over(w))
      .select(col("arm"), col("day"), col("n"), col("x"),
        (col("cum").cast(DoubleType) / lit(LogScale.toDouble)).as("llr"),
        when(col("cum") >= bound, "accept_h1")
          .when(col("cum") <= -bound, "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy(col("arm"), col("day"))
  }

  // ------------------------------------------- ranked-retrieval evaluation
  /** Cut depth for [[ndcg]]'s ranked metrics. */
  private[graft] val NdcgK = 10
  /** Fixed point for the position-discount weights (2^20). */
  private[graft] val NdcgWScale = 1L << 20
  /** Fixed point for the per-user metric quantization. */
  private[graft] val NdcgQScale = 1000000L
  /** w_i = round(scale / log2(i+1)) for i = 1..[[NdcgK]] — computed ONCE
    * here at build time and interpolated as LITERALS into both the Spark
    * plan and the oracle SQL, so no engine ever evaluates a float log. */
  private[graft] val NdcgWeights: Seq[Long] = (1 to NdcgK).map(i =>
    math.floor(NdcgWScale.toDouble / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** NDCG@k / MRR / recall@k / hit-rate of a popularity recommender —
    * the ranked-metric battery beside [[cfEval]]'s flat hit rate, and the
    * evaluation shape every retrieval stack (BM25, ANN, hybrid RRF) plugs
    * its own ranking into. Train/test split by order-key parity; the
    * "model" ranks parts by train-split quantity (ties by part key); per
    * test user, graded relevance = quantity bought. All metric arithmetic
    * is EXACT INTEGER: position discounts are the [[NdcgWeights]]
    * literals, DCG/IDCG are integer dot products (≤ user-volume·2^20 ≈
    * 10¹¹ per user — 10⁷ of int64 headroom even ×[[NdcgQScale]]), and
    * each per-user metric quantizes by ONE integral division (DCG ≤ IDCG
    * guarantees ndcg_q ≤ 10⁶), so the cross-user mean is a ratio of two
    * exact sums. Scale shape: two fact-to-(cust, part) reductions, a
    * 10-row LIMIT-bounded broadcast for the ranking, one partitioned
    * window capped at k rows per user — nothing data-scale crosses a
    * driver or a broadcast.
    */
  def ndcg(spark: SparkSession, dir: String): DataFrame = {
    val warr = array(NdcgWeights.map(lit): _*)
    def qcents(c: Column): Column = (c.cast(DecimalType(12, 2)) * 100).cast(LongType)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey").as("pk"),
        qcents(col("l_quantity")).as("q"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("cust"),
        (col("o_orderkey") % 2).as("par"))
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val train = joined.filter(col("par") === 0)
      .groupBy(col("pk")).agg(sum(col("q")).as("pop"))
    val topw = train.orderBy(col("pop").desc, col("pk")).limit(NdcgK)
      .agg(sort_array(collect_list(struct((col("pop") * -1).as("np"), col("pk")))).as("a"))
      .select(posexplode(col("a")))
      .select((col("pos") + 1).cast(LongType).as("i"), col("col.pk").as("pk"))
      .withColumn("w", element_at(warr, (col("i")).cast(IntegerType)))
    val rel = joined.filter(col("par") === 1)
      .groupBy(col("cust"), col("pk")).agg(sum(col("q")).as("rel"))
    val base = rel.groupBy(col("cust")).agg(count(lit(1)).as("m"))
    val w = Window.partitionBy(col("cust")).orderBy(col("rel").desc, col("pk"))
    val idcgF = rel.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= NdcgK)
      .select(col("cust"),
        (col("rel") * element_at(warr, col("rn"))).as("t"))
      .groupBy(col("cust")).agg(sum(col("t")).as("idcg"))
    val dcgF = rel.join(broadcast(topw), Seq("pk"))
      .groupBy(col("cust"))
      .agg(sum(col("rel") * col("w")).as("dcg"), min(col("i")).as("first_hit"),
        count(lit(1)).as("n_hits"))
    val per = base.join(idcgF, Seq("cust")).join(dcgF, Seq("cust"), "left")
      .select(
        expr(s"coalesce((coalesce(dcg, 0L) * $NdcgQScale) div nullif(idcg, 0L), 0L)")
          .as("ndcg_q"),
        expr(s"coalesce($NdcgQScale div first_hit, 0L)").as("mrr_q"),
        expr(s"(coalesce(n_hits, 0L) * $NdcgQScale) div least(m, ${NdcgK}L)").as("rec_q"),
        when(col("dcg").isNotNull, 1L).otherwise(0L).as("hit"))
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    def dbl(c: Column): Column = c.cast(DoubleType)
    per.agg(count(lit(1)).as("n_users"),
        sum(dec(col("ndcg_q"))).as("sn"), sum(dec(col("mrr_q"))).as("sm"),
        sum(dec(col("rec_q"))).as("sr"), sum(col("hit")).as("sh"))
      .select(col("n_users"),
        (dbl(col("sn")) / (dbl(col("n_users")) * lit(NdcgQScale.toDouble))).as("mean_ndcg"),
        (dbl(col("sm")) / (dbl(col("n_users")) * lit(NdcgQScale.toDouble))).as("mean_mrr"),
        (dbl(col("sr")) / (dbl(col("n_users")) * lit(NdcgQScale.toDouble))).as("mean_recall"),
        (dbl(col("sh")) / dbl(col("n_users"))).as("hit_rate"))
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Classical-statistics operators over the fact tables — the
  * distribution-audit battery a pipeline runs beside the profiling tier
  * (ProfileOps) before trusting a 100 TB corpus: linear dependence
  * (correlation matrix), temporal dependence (autocorrelation),
  * digit-law conformance (Benford audit), two-sample distribution
  * equality (Kolmogorov–Smirnov), and abrupt-shift location
  * (max-deviation changepoint).
  *
  * The arithmetic discipline is the repo-wide one: every statistic is a
  * closed-form combination of EXACT integer moments (cents-scaled longs,
  * DECIMAL(38,0) where squares overflow int64), with float operations
  * confined to a final, identically-ordered expression both engines
  * evaluate on identical inputs — so even the float outputs hash-match.
  * Logarithms only ever take INTEGER arguments (the entropyDim
  * precedent), quantized to [[StatsOps.LogScale]] fixed-point before any
  * further arithmetic.
  */
object StatsOps {

  /** Fixed-point scale for quantized logarithms (2^20, the EntScale
    * convention). */
  private[graft] val LogScale = 1L << 20

  /** floor(log10(m)·scale + 0.5) of a strictly-positive integer column —
    * deterministic across engines because the argument set is integers. */
  private def l10q(m: Column): Column =
    floor(log10(m.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5))
      .cast(LongType)

  // ------------------------------------------------------ correlation matrix
  /** Pearson correlation matrix over the four lineitem measures
    * (quantity, extendedprice, discount, tax), emitted as the 6-row
    * upper triangle. ONE scan computes every sufficient statistic —
    * n, Σx, Σx², and all six Σxy — as exact integers (hundredths-scaled
    * longs; the sums of squares as DECIMAL(38,0), since price² ×
    * 6·10⁵ rows already overflows int64), and each correlation is then
    * one closed-form double expression over those moments (the olsFit
    * contract). At 100 TB this is the textbook map-side-combinable
    * aggregate: 14 partial sums per partition, one 1-row reduce, zero
    * shuffles of row data — the plan cost is the scan, independent of
    * how many pairs the triangle holds. The 6 output rows pivot out of
    * the single aggregate row via one explode, never a second pass.
    */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("quantity", "extendedprice", "discount", "tax")
    val li = Tables.lineitem(spark, dir).select(
      (col("l_quantity").cast(DecimalType(12, 2)) * 100).cast(LongType).as("quantity"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("extendedprice"),
      (col("l_discount").cast(DecimalType(12, 2)) * 100).cast(LongType).as("discount"),
      (col("l_tax").cast(DecimalType(12, 2)) * 100).cast(LongType).as("tax"))
    val sums = Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
      (for (x <- cols; y <- cols if x <= y) yield
        sum(col(x).cast(DecimalType(38, 0)) * col(y)).as(s"s_${x}_$y"))
    val m = li.agg(sums.head, sums.tail: _*)
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val pairs = for (x <- cols; y <- cols if x < y) yield {
      val num = dbl("n") * dbl(s"s_${x}_$y") - dbl(s"s_$x") * dbl(s"s_$y")
      val dx  = dbl("n") * dbl(s"s_${x}_$x") - dbl(s"s_$x") * dbl(s"s_$x")
      val dy  = dbl("n") * dbl(s"s_${y}_$y") - dbl(s"s_$y") * dbl(s"s_$y")
      // nullif, not bare division: a zero-variance column would make the
      // ANSI divide raise (and NaN-vs-inf diverge across engines anyway);
      // NULL is the portable "undefined correlation"
      struct(lit(x).as("x"), lit(y).as("y"),
        (num / nullif(sqrt(dx * dy), lit(0.0))).as("corr"))
    }
    m.select(col("n"), explode(array(pairs: _*)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"), col("n"), col("p.corr").as("corr"))
      .orderBy(col("x"), col("y"))
  }

  // --------------------------------------------------------- autocorrelation
  /** Largest lag examined by [[autocorr]] (calendar days). */
  private[graft] val AutocorrMaxLag = 7

  /** Lag-1..[[AutocorrMaxLag]] autocorrelation of the daily order-count
    * series — the seasonality detector (a weekly cycle shows up as a
    * lag-7 peak). The series is first REDUCED to one row per calendar
    * day (O(days), bounded by the calendar no matter the data volume),
    * so the lagged self-join is a days-sized equi-join on `day + lag =
    * day`, never a window over raw facts; each lag's Pearson r then
    * comes from exact integer moments over the paired counts (counts
    * are ≤ |orders|, squares ≤ 10¹¹·days — comfortably int64). Days
    * missing from the data are absent from both sides (pairs require
    * both endpoints), which is the standard irregular-series treatment
    * and keeps the op calendar-free. The 7× explode happens on the
    * days-sized aggregate, not the fact scan.
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(datediff(col("o_orderdate").cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(LongType).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val lagged = daily
      .select(col("day"), col("cnt"),
        explode(sequence(lit(1L), lit(AutocorrMaxLag.toLong))).as("lag"))
      .select(col("lag"), (col("day") + col("lag")).as("probe_day"), col("cnt").as("x"))
    val pairs = lagged.join(
      broadcast(daily.select(col("day").as("probe_day"), col("cnt").as("y"))),
      Seq("probe_day"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val num = dbl("n_pairs") * dbl("sxy") - dbl("sx") * dbl("sy")
    val dx  = dbl("n_pairs") * dbl("sxx") - dbl("sx") * dbl("sx")
    val dy  = dbl("n_pairs") * dbl("syy") - dbl("sy") * dbl("sy")
    m.select(col("lag"), col("n_pairs"),
        (num / nullif(sqrt(dx * dy), lit(0.0))).as("autocorr"))
      .orderBy(col("lag"))
  }

  // ----------------------------------------------------------- Benford audit
  /** First-significant-digit audit of order totals against Benford's law
    * — the classic fabricated-data screen. Digits come from the exact
    * cents integer (×100 shifts the decimal point, so the leading digit
    * is unchanged); the expected Benford mass log10(1+1/d) is computed
    * as l10q(d+1) − l10q(d) — logs of the integers 1..10 only, quantized
    * to [[LogScale]] — so the expected column is bit-identical across
    * engines. One map-side-combinable groupBy to 9 rows; the grand total
    * joins on as a 1-row broadcast cross (the cluster-profile shape).
    * The deviation column is |observed − expected| share; the audit
    * flags a corpus when the max deviation is large (here the synthetic
    * uniform-ish prices fail Benford loudly, which is the point of
    * printing both columns).
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast(LongType).as("cents"))
      .select(substring(col("cents").cast(StringType), 1, 1)
        .cast(LongType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("n_total"))
    val expectedQ = l10q(col("digit") + 1) - l10q(col("digit"))
    digits.join(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast(DoubleType) / col("n_total").cast(DoubleType)).as("pct"),
        (expectedQ.cast(DoubleType) / lit(LogScale.toDouble)).as("benford_pct"))
      .withColumn("abs_dev", abs(col("pct") - col("benford_pct")))
      .orderBy(col("digit"))
  }

  // ----------------------------------------------- two-sample KS statistic
  /** The two compared corpus slices (shared with the oracle SQL). */
  private[graft] val KsSourceA = "src0"
  private[graft] val KsSourceB = "src1"
  /** Width of the value buckets that carry the two-level prefix sum. */
  private[graft] val KsBucketWidth = 64L

  /** Two-sample Kolmogorov–Smirnov statistic between the document-length
    * distributions of [[KsSourceA]] and [[KsSourceB]] — the
    * distribution-shift gate between two corpus slices. D = sup|F₁−F₂|
    * is EXACT RATIONAL here: with per-value counts c₁,c₂ and cumulative
    * counts C₁,C₂, D = max|C₁·n₂ − C₂·n₁| / (n₁·n₂), all integers until
    * the final division.
    *
    * The cumulative counts use the scalable two-level prefix-sum shape,
    * because a single global cumsum window would serialize the whole
    * distinct-value set through one partition (the PlanGuard ban):
    * values reduce to one row per distinct length, lengths hash into
    * fixed-width buckets, the cumsum WITHIN a bucket is a window
    * partitioned by bucket, and the cross-bucket offsets come from a
    * triangular probe over the bucket-total aggregate — a table bounded
    * by value-range/width (9 rows here, O(range) always), which is the
    * sanctioned tiny-build-side nested-loop shape. At 100 TB the fact
    * scan reduces to |distinct lengths| rows before any of this runs.
    * The max row carries the location: `at_value` is the smallest length
    * attaining D (deterministic tiebreak).
    */
  /** The shared two-sample cumulative table: one row per distinct value of
    * documents.n_chars present in either [[KsSourceA]] or [[KsSourceB]],
    * with per-value counts (c1, c2) and INCLUSIVE cumulative counts
    * (f1, f2) — built with the two-level prefix-sum shape (in-bucket
    * partitioned window + triangular offset probe over the bucket-total
    * aggregate) because the PlanGuard bans a global cumsum window.
    * Consumed by [[ksTest]] and [[mannWhitney]]. */
  private def twoSampleCum(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("source").isin(KsSourceA, KsSourceB))
      .select(col("n_chars").as("v"), col("source"))
    val perValue = d.groupBy(col("v")).agg(
        sum(when(col("source") === KsSourceA, 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") === KsSourceB, 1L).otherwise(0L)).as("c2"))
      .withColumn("bucket", expr(s"v div $KsBucketWidth"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = perValue
      .withColumn("r1", sum(col("c1")).over(w))
      .withColumn("r2", sum(col("c2")).over(w))
    val bucketTotals = perValue.groupBy(col("bucket"))
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
    val offsets = bucketTotals.select(col("bucket").as("b"))
      .join(broadcast(bucketTotals), col("bucket") < col("b"), "left")
      .groupBy(col("b"))
      .agg(coalesce(sum(col("t1")), lit(0L)).as("off1"),
        coalesce(sum(col("t2")), lit(0L)).as("off2"))
    inBucket
      .join(broadcast(offsets), col("bucket") === col("b"))
      .select(col("v"), col("c1"), col("c2"),
        (col("off1") + col("r1")).as("f1"),
        (col("off2") + col("r2")).as("f2"))
  }

  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val cum = twoSampleCum(spark, dir).select(col("v"), col("f1"), col("f2"))
    // the final cumulative IS the total — no second pass over the raw side
    val totals = cum.agg(max(col("f1")).as("n1"), max(col("f2")).as("n2"))
    val dev = cum.join(broadcast(totals))
      .select(col("v"), abs(col("f1") * col("n2") - col("f2") * col("n1")).as("dnum"),
        col("n1"), col("n2"))
    val dmax = dev.groupBy(col("n1"), col("n2")).agg(max(col("dnum")).as("d_num"))
    dev.join(broadcast(dmax.select(col("d_num"))), col("dnum") === col("d_num"))
      .groupBy(col("n1"), col("n2"), col("d_num"))
      .agg(min(col("v")).as("at_value"))
      .select(col("n1"), col("n2"), col("at_value"), col("d_num"),
        (col("d_num").cast(DoubleType)
          / (col("n1") * col("n2")).cast(DoubleType)).as("d_stat"))
  }

  // -------------------------------------------------- Mann–Whitney U test
  /** Mann–Whitney U between the same two corpus slices as [[ksTest]] —
    * the rank-based location test that complements KS's shape test. All
    * rank arithmetic is EXACT INTEGER via doubled midranks: with
    * combined per-value counts c = c₁+c₂ and exclusive cumulative
    * counts F_excl, the (tie-averaged) midrank of value v is
    * (2·F_excl + c + 1)/2 — so 2·R₁ = Σ c₁·(2·F_excl + c + 1) is an
    * integer, and 2·U₁ = 2·R₁ − n₁(n₁+1) stays one. The op reuses
    * [[twoSampleCum]] (two-level prefix sums, no global window) and
    * finishes with one aggregate; `auc` = U₁/(n₁·n₂) is the
    * probability-of-superiority effect size, the only division.
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val cum = twoSampleCum(spark, dir)
      .select(col("v"), col("c1"), col("c2"), col("f1"), col("f2"),
        // doubled midrank: exclusive combined cum ×2, plus own count +1
        (lit(2L) * (col("f1") + col("f2") - col("c1") - col("c2"))
          + col("c1") + col("c2") + lit(1L)).as("rank2"))
    cum.agg(
        max(col("f1")).as("n1"), max(col("f2")).as("n2"),
        sum(col("c1") * col("rank2")).as("r1_2"))
      .select(col("n1"), col("n2"),
        (col("r1_2") - col("n1") * (col("n1") + 1)).as("u1_2"))
      .select(col("n1"), col("n2"),
        (col("u1_2").cast(DoubleType) / lit(2.0)).as("u1"),
        ((lit(2L) * col("n1") * col("n2") - col("u1_2")).cast(DoubleType)
          / lit(2.0)).as("u2"),
        (col("u1_2").cast(DoubleType)
          / (lit(2L) * col("n1") * col("n2")).cast(DoubleType)).as("auc"))
  }

  // ------------------------------------------------------- Welch's t-test
  /** The two compared customer segments (shared with the oracle SQL). */
  private[graft] val TtSegA = "AUTOMOBILE"
  private[graft] val TtSegB = "BUILDING"

  /** Welch's unequal-variance t-test between the account-balance
    * distributions of two market segments. ONE conditional-moment scan —
    * no join at all: six exact integer sums (counts, cents, squared
    * cents as DECIMAL(38,0)) reduce map-side to a single row, and the
    * t statistic and Welch–Satterthwaite df are one closed-form double
    * expression each over those moments, written identically in both
    * engines. The 100 TB cost is the scan, full stop.
    */
  def welchTtest(spark: SparkSession, dir: String): DataFrame = {
    def side(seg: String, tag: String) = Seq(
      sum(when(col("c_mktsegment") === seg, 1L).otherwise(0L)).as(s"n$tag"),
      sum(when(col("c_mktsegment") === seg, col("cents")).otherwise(0L)).as(s"s$tag"),
      sum(when(col("c_mktsegment") === seg,
        col("cents").cast(DecimalType(38, 0)) * col("cents")).otherwise(lit(0L)))
        .as(s"ss$tag"))
    val sums = side(TtSegA, "1") ++ side(TtSegB, "2")
    val m = Tables.customer(spark, dir)
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .agg(sums.head, sums.tail: _*)
    def dbl(c: String): Column = col(c).cast(DoubleType)
    def meanv(t: String): Column = dbl(s"s$t") / dbl(s"n$t")
    def varv(t: String): Column =
      (dbl(s"ss$t") - dbl(s"s$t") * dbl(s"s$t") / dbl(s"n$t")) / (dbl(s"n$t") - lit(1.0))
    val se1 = varv("1") / dbl("n1")
    val se2 = varv("2") / dbl("n2")
    m.select(col("n1"), col("n2"),
      meanv("1").as("mean1"), meanv("2").as("mean2"),
      ((meanv("1") - meanv("2")) / sqrt(se1 + se2)).as("t_stat"),
      (((se1 + se2) * (se1 + se2))
        / (se1 * se1 / (dbl("n1") - lit(1.0)) + se2 * se2 / (dbl("n2") - lit(1.0))))
        .as("welch_df"))
  }

  // --------------------------------------------------------- one-way ANOVA
  /** One-way ANOVA of order totals across the five order priorities.
    * Group moments are exact integers (cents, squares as DECIMAL(38,0));
    * the cross-group reduction of the per-group double terms s²/n uses
    * the chisq precedent — an ORDER-PINNED fold over the sorted group
    * list (groups are a bounded dimension) — so even the float F
    * statistic is identical in both engines, where a hash-aggregate sum
    * of doubles would be order-nondeterministic. SSB/SSW come from the
    * standard decomposition; eta² is the effect size.
    */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("cents")).as("s_g"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("cents")).as("ss_g"))
    g.agg(
        count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).as("grand"),
        // order-pinned folds: Σ s²/n and Σ ss as doubles, group order
        sort_array(collect_list(struct(col("grp"),
          (col("s_g").cast(DoubleType) * col("s_g").cast(DoubleType)
            / col("n_g").cast(DoubleType)).as("t1"),
          col("ss_g").cast(DoubleType).as("t2")))).as("terms"))
      .select(col("k"), col("n"),
        aggregate(col("terms"), lit(0.0), (acc, s) => acc + s.getField("t1")).as("sum_sq_n"),
        aggregate(col("terms"), lit(0.0), (acc, s) => acc + s.getField("t2")).as("sum_ss"),
        (col("grand").cast(DoubleType) * col("grand").cast(DoubleType)
          / col("n").cast(DoubleType)).as("cf"))
      .select(col("k"), col("n"),
        (col("sum_sq_n") - col("cf")).as("ssb"),
        (col("sum_ss") - col("sum_sq_n")).as("ssw"))
      .select(col("k"), col("n"), col("ssb"), col("ssw"),
        ((col("ssb") / (col("k") - lit(1L)).cast(DoubleType))
          / (col("ssw") / (col("n") - col("k")).cast(DoubleType))).as("f_stat"),
        (col("ssb") / (col("ssb") + col("ssw"))).as("eta_sq"))
  }

  // ------------------------------------------------ forecast backtest
  /** Seasonal-naive forecast backtest over the daily revenue series: for
    * every day with both a yesterday and a same-weekday-last-week
    * predecessor, compare the naive-1 forecast (x_{t−1}) and the
    * seasonal-naive-7 forecast (x_{t−7}) against the actual, and report
    * both MAEs plus the skill score 1 − MAE₇/MAE₁ — the first number a
    * forecasting pipeline computes, because it prices whether weekly
    * seasonality is worth modeling at all. Errors are exact integer
    * cents summed exactly; the two divisions and the skill ratio are
    * the only floats. The series reduces to O(days) BEFORE any join
    * (the autocorr shape), and both predecessor lookups are one
    * days-sized equi-join each against broadcast probe sides — no
    * window, no sequential recurrence, nothing fact-scale after the
    * first aggregate.
    */
  def forecastEval(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(datediff(col("o_orderdate").cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(LongType).as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
    val eval = daily
      .join(broadcast(daily.select((col("day") + 1).as("day"), col("x").as("x1"))),
        Seq("day"))
      .join(broadcast(daily.select((col("day") + 7).as("day"), col("x").as("x7"))),
        Seq("day"))
    eval.agg(
        count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("x1"))).as("ae1"),
        sum(abs(col("x") - col("x7"))).as("ae7"))
      .select(col("n_eval"),
        (col("ae1").cast(DoubleType) / col("n_eval").cast(DoubleType)).as("mae1_cents"),
        (col("ae7").cast(DoubleType) / col("n_eval").cast(DoubleType)).as("mae7_cents"),
        (lit(1.0) - col("ae7").cast(DoubleType)
          / nullif(col("ae1"), lit(0L)).cast(DoubleType)).as("skill"))
  }

  // -------------------------------------------- jackknife (bucketed CI)
  /** Number of leave-one-out buckets for [[jackknife]]. */
  private[graft] val JkBuckets = 20L

  /** Delete-one-bucket jackknife confidence interval for the mean order
    * total — the deterministic resampling method a 100 TB pipeline uses
    * where bootstrap's per-row randomness would break reproducibility
    * (and per-row resampling would shuffle the world): rows hash into
    * [[JkBuckets]] fixed buckets (md5 of the key — append-stable),
    * leave-one-out means come from the bucket-sum table by subtraction,
    * and the jackknife variance is (B−1)/B · Σ(m_i − m̄)². Everything
    * up to the 20-element statistics is exact integer (bucket sums of
    * cents); the float folds over the B bucket rows are ORDER-PINNED
    * sorted-list folds (the chisq/anova precedent). One scan, one
    * B-row aggregate, zero joins.
    */
  def jackknife(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(spark, dir)
      .select(
        expr(s"CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % $JkBuckets")
          .as("bucket"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"), sum(col("cents")).as("s_b"))
    val t = b.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("n_b")).as("n"),
      sum(col("s_b")).as("s"),
      sort_array(collect_list(struct(col("bucket"), col("n_b"), col("s_b")))).as("bs"))
    // leave-one-out means (exact-int inputs, one division each), then two
    // pinned folds: their sum (for the jackknife mean) and the squared
    // deviations from it
    val loo = expr(
      """transform(bs, x ->
        |  (CAST(s AS DOUBLE) - CAST(x.s_b AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST(x.n_b AS DOUBLE)))""".stripMargin)
    t.withColumn("loo", loo)
      .withColumn("m_bar",
        expr("aggregate(loo, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
          / col("n_buckets").cast(DoubleType))
      .withColumn("jk_var",
        expr("aggregate(loo, CAST(0.0 AS DOUBLE), (a, x) -> a + (x - m_bar) * (x - m_bar))")
          * (col("n_buckets") - 1).cast(DoubleType) / col("n_buckets").cast(DoubleType))
      .select(
        col("n"), col("n_buckets"),
        (col("s").cast(DoubleType) / col("n").cast(DoubleType)).as("mean_cents"),
        sqrt(col("jk_var")).as("se_cents"),
        (col("s").cast(DoubleType) / col("n").cast(DoubleType)
          - lit(1.96) * sqrt(col("jk_var"))).as("ci_lo"),
        (col("s").cast(DoubleType) / col("n").cast(DoubleType)
          + lit(1.96) * sqrt(col("jk_var"))).as("ci_hi"))
  }

  // ------------------------------------------------- changepoint locator
  /** Max-deviation changepoint locator over each event type's daily
    * volume series: the day t* maximizing |prefix(t)·n_days −
    * t·total| — the CUSUM-family statistic that peaks where the series'
    * rate shifts (equivalently, the KS distance between event times and
    * a uniform-in-time null). Scaling the comparison by n_days keeps
    * everything integer (counts ≤ total, prefix·n_days ≤ total·days —
    * int64 with orders of headroom); `shift_frac` normalizes once at
    * the end.
    *
    * The 100 TB shape: facts reduce to one row per (type, day) first —
    * O(types·days), calendar-bounded — the running sum is a window
    * partitioned BY TYPE (never global), and the argmax day resolves by
    * joining the per-type max back on the exact deviation value (equi,
    * aggregate-sized) with a min-day tiebreak, instead of any ordered
    * collect.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast(DateType).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cum = daily
      .withColumn("t", row_number().over(w).cast(LongType))
      .withColumn("prefix", sum(col("cnt"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("total"))
    val dev = cum.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n_days"), col("total"),
        abs(col("prefix") * col("n_days") - col("t") * col("total")).as("dev"))
    val best = dev.groupBy(col("event_type")).agg(max(col("dev")).as("max_dev"))
    dev.join(broadcast(best), Seq("event_type"))
      .filter(col("dev") === col("max_dev"))
      .groupBy(col("event_type"), col("n_days"), col("total"), col("max_dev"))
      .agg(min(col("day")).as("best_day"))
      .select(col("event_type"), col("n_days"), col("total"), col("best_day"),
        (col("max_dev").cast(DoubleType)
          / (col("n_days") * col("total")).cast(DoubleType)).as("shift_frac"))
      .orderBy(col("event_type"))
  }

  // ------------------------------------------------ calibration (ECE bins)
  /** Number of equal-width confidence bins for [[calibration]]. */
  private[graft] val CalBins = 10L

  /** Reliability-diagram bins + expected calibration error for a
    * classifier score against a binary outcome — the audit an
    * ML-data pipeline runs on every model whose scores gate a filter
    * (quality classifiers, toxicity, langid). The "model" here is a
    * deterministic md5-derived pseudo-score in [0,1) (the stratified-
    * sample discipline — a real model's score column drops in
    * unchanged); the outcome is `event_type = 'purchase'`.
    *
    * Per bin, the exact integer moments (n, Σmilli-confidence, n_pos)
    * produce mean-confidence and positive-rate as single divisions;
    * ECE = Σ_b n_b·|gap_b| / N is a float sum across the
    * [[CalBins]]-row aggregate, ORDER-PINNED by bin (the anova fold).
    * One fact scan, one 10-row groupBy with map-side combine, a 1-row
    * broadcast cross for the total — O(bins) state at any data size.
    */
  /** The reliability-bin frame (bin, n, sm, n_pos) shared by
    * [[calibration]] and [[isotonic]]: synthetic md5-milli confidence
    * bucketed into [[CalBins]] score deciles, one combining aggregate. */
  private def calBins(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(
        (TextOps.h32(col("event_id").cast(StringType)) % 1000L).as("milli"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .select(expr(s"milli * $CalBins div 1000").as("bin"), col("milli"), col("pos"))
    e.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("milli")).as("sm"), sum(col("pos")).as("n_pos"))
  }

  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val bins = calBins(spark, dir)
      .withColumn("mean_conf",
        col("sm").cast(DoubleType) / (col("n").cast(DoubleType) * lit(1000.0)))
      .withColumn("frac_pos", col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("abs_gap", abs(col("frac_pos") - col("mean_conf")))
    val tot = bins.agg(
        sum(col("n")).as("n_total"),
        sort_array(collect_list(struct(col("bin"),
          (col("n").cast(DoubleType) * col("abs_gap")).as("w")))).as("terms"))
      .select(
        (aggregate(col("terms"), lit(0.0), (a, s) => a + s.getField("w"))
          / col("n_total").cast(DoubleType)).as("ece"))
    bins.join(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        col("mean_conf"), col("frac_pos"), col("abs_gap"), col("ece"))
      .orderBy(col("bin"))
  }

  // ------------------------------------- isotonic calibration (PAV fit)
  /** Isotonic (monotone non-decreasing) calibration of the reliability
    * bins — the PAV fit every probability calibrator runs after
    * [[calibration]] flags miscalibration. Computed NOT by the
    * sequential pool-adjacent-violators sweep (hostile to both engines)
    * but by its CLOSED FORM, iso(i) = max_{j≤i} min_{k≥i} mean(j..k):
    * interval means come from exact integer prefix sums over the
    * [[CalBins]]-row spine (a triangular self-join — spine-scale, never
    * row-scale), and the min/max comparisons divide exact integers in
    * one identical expression, so both engines order and pick the same
    * doubles. Output: per bin, the raw positive rate beside the fitted
    * monotone rate — the mapping a serving layer applies.
    *
    * Scale shape: ONE fact pass to the bin grain (the shared calBins
    * aggregate); everything above is O(bins³) on literal-scale frames,
    * broadcast throughout. 100 TB changes only the first aggregate.
    */
  def isotonic(spark: SparkSession, dir: String): DataFrame = {
    val bins = calBins(spark, dir)
      .select(col("bin"), col("n"), col("n_pos"))
    // exact prefix sums by triangular self-join on the tiny spine
    val pre = bins.select(col("bin").as("pb"))
      .join(broadcast(bins), col("bin") <= col("pb"))
      .groupBy(col("pb")).agg(sum(col("n")).as("cn"), sum(col("n_pos")).as("cp"))
    // interval (j..k) sums: cum(k) − cum(j) + bin(j) itself
    val ivSums = bins.select(col("bin").as("j"), col("n").as("nj"), col("n_pos").as("pj"))
      .join(broadcast(pre.select(col("pb").as("j"), col("cn").as("cnj"), col("cp").as("cpj"))), Seq("j"))
      .join(broadcast(pre.select(col("pb").as("k"), col("cn").as("cnk"), col("cp").as("cpk"))),
        col("j") <= col("k"))
      .select(col("j"), col("k"),
        (col("cnk") - col("cnj") + col("nj")).as("sn"),
        (col("cpk") - col("cpj") + col("pj")).as("sp"))
    val cand = bins.select(col("bin").as("i"))
      .join(broadcast(ivSums), col("j") <= col("i") && col("k") >= col("i"))
      .withColumn("mean", col("sp").cast(DoubleType) / col("sn").cast(DoubleType))
    val inner = cand.groupBy(col("i"), col("j")).agg(min(col("mean")).as("inner_min"))
    val iso = inner.groupBy(col("i")).agg(max(col("inner_min")).as("iso_rate"))
    bins.join(iso, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType)).as("raw_rate"),
        col("iso_rate"))
      .orderBy(col("bin"))
  }

  // --------------------------------------- population stability index (PSI)
  /** Number of fixed-width value bins for [[psi]]. */
  private[graft] val PsiBins = 8L
  /** Width of one PSI bin in cents. */
  private[graft] val PsiBinCents = 4000L

  /** Population stability index between the first- and second-half-of-
    * month event-value distributions — the standard drift gate between
    * a model's training window and its serving window (complementing
    * `q_drift_linf`'s sup-norm with the log-weighted mass shift).
    * Counts are Laplace-smoothed (+1 per bin, +[[PsiBins]] per period)
    * so empty bins stay defined, and every logarithm takes an INTEGER
    * argument — ln(s_a·n_b) − ln(s_b·n_a) quantized to [[LogScale]] —
    * so the per-bin term is bit-stable across engines. The bin spine is
    * a literal [[PsiBins]]-row range (bins missing from the data still
    * contribute their smoothed mass), the fact scan reduces to ≤ 2·bins
    * conditional counts with map-side combine, and the total PSI is an
    * order-pinned fold over the bin rows.
    */
  def psi(spark: SparkSession, dir: String): DataFrame = {
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5)).cast(LongType)
    val counts = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(
        // clamped on BOTH ends: without greatest(_, 0) a negative value
        // would land on a negative bin that silently falls off the 0..7
        // spine, and negative-cents division truncates (Spark) vs floors
        // (DuckDB //) — the clamp collapses every negative to bin 0 in
        // both engines, so the domain assumption is enforced, not implicit
        greatest(least((col("value").cast(DecimalType(12, 2)) * 100).cast(LongType)
          .divide(lit(PsiBinCents)).cast(LongType), lit(PsiBins - 1)), lit(0L)).as("bin"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("in_a"))
      .groupBy(col("bin"))
      .agg(sum(col("in_a")).as("ca"), sum(lit(1L) - col("in_a")).as("cb"))
    val spine = spark.range(PsiBins).select(col("id").as("bin"))
    val smoothed = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (coalesce(col("ca"), lit(0L)) + 1L).as("sa"),
        (coalesce(col("cb"), lit(0L)) + 1L).as("sb"))
    val tot = smoothed.agg(sum(col("sa")).as("na"), sum(col("sb")).as("nb"))
    val terms = smoothed.join(broadcast(tot))
      .withColumn("share_a", col("sa").cast(DoubleType) / col("na").cast(DoubleType))
      .withColumn("share_b", col("sb").cast(DoubleType) / col("nb").cast(DoubleType))
      .withColumn("psi_term",
        (col("share_a") - col("share_b"))
          // the log arguments are products of two data-scale counts:
          // DECIMAL(19,0) multiply (every long representable; product
          // <= 8.5e37 fits DECIMAL(38,0) exactly) replaces the int64
          // product that wraps silently at 9.2e18 (ADVICE r10/r11); the
          // oracle multiplies in HUGEINT + reads via the VARCHAR detour
          * (lnq(col("sa").cast(DecimalType(19, 0)) * col("nb").cast(DecimalType(19, 0)))
            - lnq(col("sb").cast(DecimalType(19, 0)) * col("na").cast(DecimalType(19, 0)))).cast(DoubleType)
          / lit(LogScale.toDouble))
    val total = terms.agg(
        sort_array(collect_list(struct(col("bin"), col("psi_term").as("t")))).as("ts"))
      .select(aggregate(col("ts"), lit(0.0), (a, s) => a + s.getField("t")).as("psi"))
    terms.join(broadcast(total))
      .select(col("bin"), (col("sa") - 1L).as("n_a"), (col("sb") - 1L).as("n_b"),
        col("share_a"), col("share_b"), col("psi_term"), col("psi"))
      .orderBy(col("bin"))
  }

  // ------------------------------------------- categorical mutual information
  /** Mutual information between order priority and order status — the
    * feature-dependence screen (feature selection, leakage detection:
    * a high-MI pair flags a column that encodes the label). EXACT up to
    * one final division: with cell counts c_xy and margins c_x, c_y over
    * N rows, MI = Σ c_xy·[lnq(c_xy·N) − lnq(c_x·c_y)] / (N·[[LogScale]])
    * — every log takes an integer argument (the collocations/PMI
    * discipline), each cell's contribution c_xy·pmi_q is an exact int64
    * product, and their SUM is integer too, so the total needs no
    * float-fold pinning at all. Shape: one groupBy to |X|·|Y| cells,
    * margins re-aggregated from the cell table (never a second fact
    * scan), broadcast-joined back — O(cells) everywhere past the scan.
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5)).cast(LongType)
    val cells = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("x_val"), col("o_orderstatus").as("y_val"))
      .groupBy(col("x_val"), col("y_val")).agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy(col("x_val")).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col("y_val")).agg(sum(col("n_xy")).as("n_y"))
    val n = cells.agg(sum(col("n_xy")).as("n"))
    val scored = cells
      .join(broadcast(mx), Seq("x_val"))
      .join(broadcast(my), Seq("y_val"))
      .join(broadcast(n))
      // same headroom fix as psi (ADVICE r10/r11): c_xy*N and c_x*c_y are
      // data-scale x data-scale -- DECIMAL(19,0) products, HUGEINT oracle
      .withColumn("pmi_q", lnq(col("n_xy").cast(DecimalType(19, 0)) * col("n").cast(DecimalType(19, 0)))
        - lnq(col("n_x").cast(DecimalType(19, 0)) * col("n_y").cast(DecimalType(19, 0))))
    val mi = scored.agg(sum(col("n_xy").cast(DecimalType(19, 0)) * col("pmi_q")).as("mi_num"),
        max(col("n")).as("nn"))
      .select((col("mi_num").cast(DoubleType)
        / (col("nn").cast(DoubleType) * lit(LogScale.toDouble))).as("mi"))
    scored.join(broadcast(mi))
      .select(col("x_val"), col("y_val"), col("n_xy"), col("n_x"), col("n_y"),
        (col("pmi_q").cast(DoubleType) / lit(LogScale.toDouble)).as("pmi"),
        col("mi"))
      .orderBy(col("x_val"), col("y_val"))
  }

  // ------------------------------------------------------ CUPED adjustment
  /** CUPED variance-reduced A/B comparison over per-user event value:
    * pre-period value (days 1–15) is the covariate X, post-period value
    * (days 16+) the metric Y, arms assigned by md5 parity of user_id
    * (append-stable, the dataSplit discipline). θ = cov(X,Y)/var(X)
    * comes from ONE user-level moment aggregate — n, ΣX, ΣY, ΣXY, ΣX²,
    * ΣY² as exact cents integers (DECIMAL(38,0) where products overflow
    * int64) — and each arm's adjusted mean is the closed form
    * ȳ_a − θ·(x̄_a − x̄). `var_reduction` is the squared X–Y correlation —
    * the fraction of metric variance CUPED removes.
    *
    * Scale shape: one fact scan → user-level conditional sums (hash agg
    * on user_id, map-side combinable), then a 1-row global moment
    * aggregate and a 2-row arm aggregate over the SAME user table,
    * cross-joined broadcast. No window, no self-join; users missing a
    * period contribute zero to that side naturally.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("in_pre"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * col("in_pre")).as("x"),
        sum(col("cents") * (lit(1L) - col("in_pre"))).as("y"))
      .withColumn("arm",
        when(TextOps.h32(col("user_id").cast(StringType)) % 2 === 0,
          lit("control")).otherwise(lit("treatment")))
    val g = users.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
      sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val covN  = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
    val varXN = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    val varYN = dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")
    val gg = g.select(col("n"), col("sx"),
      (covN / nullif(varXN, lit(0.0))).as("theta"),
      (covN * covN / nullif(varXN * varYN, lit(0.0))).as("var_reduction"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sx_a"), sum(col("y")).as("sy_a"))
    arms.join(broadcast(gg))
      .select(col("arm"), col("n_users"),
        (dbl("sy_a") / dbl("n_users")).as("mean_post_cents"),
        (dbl("sx_a") / dbl("n_users")).as("mean_pre_cents"),
        (dbl("sy_a") / dbl("n_users")
          - col("theta") * (dbl("sx_a") / dbl("n_users") - dbl("sx") / dbl("n")))
          .as("adj_mean_cents"),
        col("theta"), col("var_reduction"))
      .orderBy(col("arm"))
  }

  // ------------------------------------------- stratified CUPED adjustment
  /** CUPED with STRATIFIED covariates — [[cuped]] refined the way a
    * real experiment platform runs it: users are stratified by
    * PRE-period spend (zero / at-or-below the mean / above — a
    * pre-treatment quantity, so stratification cannot leak outcome),
    * each stratum fits its own θ_s = cov_s(X,Y)/var_s(X), and each
    * (stratum, arm) cell reports its θ_s-adjusted mean. Per-stratum θ
    * both tightens the adjustment (spend tiers have very different X–Y
    * slopes — the zero-spend stratum has var(X) = 0 and NO usable
    * covariate, surfaced as a NULL θ rather than a global-θ distortion)
    * and exposes WHERE the variance reduction comes from. The mean cut
    * is ADAPTIVE (an absolute count/spend cut is an SF-coupled constant
    * that collapses every user into one stratum as data grows) and
    * compared exactly by integer cross-multiplication — x·n ≤ Σx as
    * DECIMAL(38,0)/HUGEINT, never a float mean.
    *
    * Scale shape unchanged from [[cuped]]: one fact scan → per-user
    * conditional sums (hash agg on user_id), then a |strata|-row moment
    * aggregate and a |strata×arms|-row cell aggregate off the SAME user
    * table, broadcast-joined on stratum. Exact cents integers,
    * DECIMAL(38,0) cross moments, float only in the final closed form.
    */
  def cupedStratified(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("in_pre"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * col("in_pre")).as("x"),
        sum(col("cents") * (lit(1L) - col("in_pre"))).as("y"))
    val tot = base.agg(count(lit(1)).as("n_all"), sum(col("x")).as("sx_all"))
    val users = base.join(broadcast(tot))
      .withColumn("stratum",
        when(col("x") === 0, lit("s0_zero"))
          .when(col("x").cast(DecimalType(38, 0)) * col("n_all")
            <= col("sx_all").cast(DecimalType(38, 0)), lit("s1_below"))
          .otherwise(lit("s2_above")))
      .withColumn("arm",
        when(TextOps.h32(col("user_id").cast(StringType)) % 2 === 0,
          lit("control")).otherwise(lit("treatment")))
      .drop("n_all", "sx_all")
    val g = users.groupBy(col("stratum")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
      sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val covN  = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
    val varXN = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    val varYN = dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")
    val gg = g.select(col("stratum"), col("n"), col("sx"),
      (covN / nullif(varXN, lit(0.0))).as("theta"),
      (covN * covN / nullif(varXN * varYN, lit(0.0))).as("var_reduction"))
    val cells = users.groupBy(col("stratum"), col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sx_a"), sum(col("y")).as("sy_a"))
    cells.join(broadcast(gg), Seq("stratum"))
      .select(col("stratum"), col("arm"), col("n_users"),
        (dbl("sy_a") / dbl("n_users")).as("mean_post_cents"),
        (dbl("sx_a") / dbl("n_users")).as("mean_pre_cents"),
        // the zero-covariate stratum adjusts by 0, not by a NULL-poisoned
        // term: coalesce(theta, 0) keeps its adjusted mean = raw mean
        (dbl("sy_a") / dbl("n_users")
          - coalesce(col("theta"), lit(0.0))
            * (dbl("sx_a") / dbl("n_users") - dbl("sx") / dbl("n")))
          .as("adj_mean_cents"),
        col("theta"), col("var_reduction"))
      .orderBy(col("stratum"), col("arm"))
  }

  // ---------------------------------------------------- daily drift monitor
  /** Per-day PSI of the event-value distribution against the all-period
    * baseline — [[psi]] turned into the DRIFT-MONITOR SERIES a serving
    * pipeline actually watches (one point per day; a sustained rise is
    * the retrain/rollback trigger, and the tumbling-window streaming twin
    * shares this exact arithmetic). Bins, clamps, +1/+[[PsiBins]]
    * smoothing, and quantized integer-argument logs are [[psi]]'s; the
    * per-day total is an order-pinned fold over the day's bin rows.
    *
    * Scale shape: ONE fact scan reduces to |days|·[[PsiBins]] counts
    * (map-side combinable); the baseline re-aggregates from those counts
    * (never a second scan); day totals and baseline broadcast onto the
    * bin spine (a literal days×bins cross of two tiny aggregates). No
    * window over fact rows at all.
    */
  def psiDaily(spark: SparkSession, dir: String): DataFrame = {
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5)).cast(LongType)
    val counts = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("ts").cast(DateType).as("day"),
        greatest(least((col("value").cast(DecimalType(12, 2)) * 100).cast(LongType)
          .divide(lit(PsiBinCents)).cast(LongType), lit(PsiBins - 1)), lit(0L)).as("bin"))
      .groupBy(col("day"), col("bin")).agg(count(lit(1)).as("c"))
    val base = counts.groupBy(col("bin")).agg(sum(col("c")).as("cb"))
    val spine = counts.select(col("day")).distinct()
      .crossJoin(broadcast(base.sparkSession.range(PsiBins).select(col("id").as("bin"))))
    val smoothed = spine
      .join(counts, Seq("day", "bin"), "left")
      .join(broadcast(base), Seq("bin"), "left")
      .select(col("day"), col("bin"),
        (coalesce(col("c"), lit(0L)) + 1L).as("sa"),
        (coalesce(col("cb"), lit(0L)) + 1L).as("sb"))
    val dayTot = smoothed.groupBy(col("day")).agg(sum(col("sa")).as("na"))
    val baseTot = base.agg((sum(col("cb")) + PsiBins).as("nb"))
    smoothed
      .join(broadcast(dayTot), Seq("day"))
      .join(broadcast(baseTot))
      .withColumn("term",
        (col("sa").cast(DoubleType) / col("na").cast(DoubleType)
          - col("sb").cast(DoubleType) / col("nb").cast(DoubleType))
          // the log arguments are products of two data-scale counts:
          // DECIMAL(19,0) multiply (every long representable; product
          // <= 8.5e37 fits DECIMAL(38,0) exactly) replaces the int64
          // product that wraps silently at 9.2e18 (ADVICE r10/r11); the
          // oracle multiplies in HUGEINT + reads via the VARCHAR detour
          * (lnq(col("sa").cast(DecimalType(19, 0)) * col("nb").cast(DecimalType(19, 0)))
            - lnq(col("sb").cast(DecimalType(19, 0)) * col("na").cast(DecimalType(19, 0)))).cast(DoubleType)
          / lit(LogScale.toDouble))
      .groupBy(col("day"))
      .agg((sum(col("sa")) - PsiBins).as("n_events"),
        sort_array(collect_list(struct(col("bin"), col("term").as("t")))).as("ts"))
      .select(col("day"), col("n_events"),
        aggregate(col("ts"), lit(0.0), (a, s) => a + s.getField("t")).as("psi"))
      .orderBy(col("day"))
  }

  // --------------------------------------------- Simpson's paradox screen
  /** Per-segment vs pooled trend-direction screen (Simpson's paradox):
    * the OLS slope of order value over time, fit per order priority AND
    * pooled, with a reversal flag where the signs disagree — the
    * aggregation-bias audit every cross-segment metric read needs before
    * anyone trusts the pooled trend. EXACT up to the closed-form
    * divisions: per-segment moments (n, Σx, Σy, Σxy, Σx²) accumulate as
    * DECIMAL(38,0) (the olsFit discipline), and the POOLED moments
    * re-aggregate from the segment moments — moments are additive, so
    * the pooled fit costs no second scan.
    */
  /** Per-priority-segment OLS moments of (orderdate epoch-day, cents) —
    * n, Σx, Σy, Σxy, Σx² as exact integers/DECIMAL(38,0) — shared by
    * [[simpsons]] and [[looInfluence]]; pooled moments RE-AGGREGATE from
    * these (additive), never a second scan. */
  private def segmentMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("segment"),
        datediff(col("o_orderdate").cast(DateType), lit("1970-01-01").cast(DateType))
          .cast(LongType).as("x"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("y"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"))

  /** The closed-form OLS slope over prefixed moment columns. */
  private def slopeOf(pfx: String): Column = {
    def d(c: String): Column = col(pfx + c).cast(DoubleType)
    (d("n") * d("sxy") - d("sx") * d("sy")) /
      nullif(d("n") * d("sxx") - d("sx") * d("sx"), lit(0.0))
  }

  def simpsons(spark: SparkSession, dir: String): DataFrame = {
    val m = segmentMoments(spark, dir)
    val pooled = m.agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
      sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"))
    def slope(pfx: String): Column = slopeOf(pfx)
    m.crossJoin(broadcast(pooled.select(
        col("n").as("p_n"), col("sx").as("p_sx"), col("sy").as("p_sy"),
        col("sxy").as("p_sxy"), col("sxx").as("p_sxx"))))
      .select(col("segment"), col("n"),
        slope("").as("slope"), slope("p_").as("pooled_slope"))
      .withColumn("is_reversed", col("slope") * col("pooled_slope") < 0)
      .orderBy(col("segment"))
  }

  // -------------------------------------------- STL-style decomposition
  /** Half-width of [[stl]]'s centered moving-average trend window. */
  private[graft] val StlHalf = 3

  /** STL-style decomposition of the daily order-revenue series into
    * trend + day-of-week seasonal + residual — the classic-decomposition
    * read behind every seasonal-adjustment and anomaly baseline (the
    * additive Cleveland shape, one pass instead of loess iterations).
    * All three components derive from EXACT integers: the trend is a
    * centered 7-day sum (sum7/7 divided only at the edge), the seasonal
    * is the per-weekday mean of the INTEGER-detrended series
    * (7·cents − sum7, so no float ever enters an aggregate), and the
    * residual is one closed-form double expression over those integers —
    * identical in both engines with zero fold-order exposure.
    *
    * Scale shape: the fact reduces to the day-scale series first; the
    * centered window is NOT a global window (banned) but a 7-row
    * OFFSET EXPLODE + equi-join on day — calendar-scale work, map-side
    * explode, no sort barrier; weekday means are a 7-row aggregate.
    * Edge days (incomplete windows) are excluded by the n = 7 count,
    * never padded.
    */
  def stl(spark: SparkSession, dir: String): DataFrame = {
    val width = 2 * StlHalf + 1
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderdate").cast(DateType).as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .withColumn("epoch",
        datediff(col("day"), lit("1970-01-01").cast(DateType)).cast(LongType))
    val probes = daily.select(col("epoch").as("center"), explode(
        sequence(lit(-StlHalf), lit(StlHalf))).as("off"))
      .select(col("center"), (col("center") + col("off")).as("epoch"))
    val win = probes.join(daily.select(col("epoch"), col("cents")), Seq("epoch"))
      .groupBy(col("center"))
      .agg(count(lit(1)).as("n_win"), sum(col("cents")).as("sum7"))
      .filter(col("n_win") === width)
    val det = daily.join(win, daily("epoch") === win("center"))
      .select(col("day"), col("epoch"), col("cents"), col("sum7"),
        (col("epoch") % 7).as("dow"),
        (col("cents") * width - col("sum7")).as("det_num")) // 7*cents - sum7, exact
    val seas = det.groupBy(col("dow"))
      .agg(sum(col("det_num")).as("s_num"), count(lit(1)).as("s_n"))
    det.join(broadcast(seas), Seq("dow"))
      .select(col("day"), col("cents"),
        (col("sum7").cast(DoubleType) / width).as("trend"),
        (col("s_num").cast(DoubleType)
          / (col("s_n") * width).cast(DoubleType)).as("seasonal"))
      .withColumn("residual",
        col("cents").cast(DoubleType) - col("trend") - col("seasonal"))
      .orderBy(col("day"))
  }

  // ------------------------------------- deterministic bootstrap CI
  /** Number of bootstrap replicates for [[bootstrapCi]]. */
  private[graft] val BootReps = 32L
  /** Modulus of the integer replicate weights (w ∈ 0..3, mean 1.5). */
  private[graft] val BootWMod = 4L

  /** Deterministic integer-weight bootstrap CI for the mean order total —
    * the replicate-based companion to [[jackknife]] where per-replicate
    * WEIGHTS replace per-row sampling: ONE md5 digest per row supplies
    * all [[BootReps]] weights (hex digit r mod [[BootWMod]], mean 1.5 —
    * scale-free, since each replicate mean is Σw·cents / Σw), which is
    * reproducible and append-stable where true multinomial resampling is
    * neither. The one-digest slicing is the CMS heavy-hitters discipline:
    * a per-(row, rep) re-hash cost 32 md5s per row and measured 4.0 s at
    * sf0.1; slicing the single digest costs one md5 + 32 substrings
    * (0.9 s). The CI is rank-based: the replicate means sort ascending
    * and the 2nd-smallest / 2nd-largest bound a ~94% interval — exact
    * order statistics, no float quantile interpolation to diverge across
    * engines; the bootstrap SE is an order-pinned fold over the sorted
    * means.
    *
    * Scale shape: the replicate explode multiplies MAP work by
    * [[BootReps]] but partial aggregation collapses each partition to
    * [[BootReps]] rows before the (tiny) shuffle — state is O(reps)
    * regardless of data size, the fact is scanned once.
    */
  // --------------------------------------------------- QQ decile comparison
  /** Quantile–quantile comparison of the [[KsSourceA]]/[[KsSourceB]]
    * document-length distributions at the 9 deciles — the LOCATION-wise
    * companion to [[ksTest]]'s sup-norm: KS says WHETHER the slices
    * differ, the QQ table says WHERE (which quantile band drifted). Both
    * engines interpolate the same exact order statistics (`percentile` ↔
    * `quantile_cont`, the equidepth contract), so the doubles hash-match.
    * Shape: two 1-row exact-percentile aggregates over the pre-reduced
    * slices, a broadcast cross, and a 9-row explode — O(1) output.
    */
  def qqDeciles(spark: SparkSession, dir: String): DataFrame = {
    val probs = (1 until 10).map(_.toDouble / 10)
    def side(s: String, out: String): DataFrame =
      Tables.documents(spark, dir)
        .filter(col("source") === s)
        .select(col("n_chars").cast(DoubleType).as("v"))
        .agg(percentile(col("v"), typedLit(probs)).as(out))
    side(KsSourceA, "qa").join(broadcast(side(KsSourceB, "qb")))
      .select(explode(sequence(lit(1), lit(9))).as("i"), col("qa"), col("qb"))
      .select((col("i") * 10).cast(IntegerType).as("decile"),
        element_at(col("qa"), col("i")).as("q_a"),
        element_at(col("qb"), col("i")).as("q_b"))
      .withColumn("diff", col("q_b") - col("q_a"))
      .withColumn("ratio", col("q_b") / nullif(col("q_a"), lit(0.0)))
      .orderBy(col("decile"))
  }

  // ---------------------------------------------- Holt linear-trend backtest
  /** Holdout horizon (days) for [[holt]]'s backtest. */
  private[graft] val HoltHorizon = 7L

  /** Holt double-exponential smoothing (level + trend, α=β=1/2) backtested
    * on the daily order-total series: fit on everything up to max(day)−
    * [[HoltHorizon]], forecast l̂+h·b̂, score against the held-out days —
    * the trend-aware upgrade of `q_forecast_eval`'s naive baselines. The
    * recursion l′=αx+(1−α)(l+b), b′=β(l′−l)+(1−β)b is an ORDERED fold a
    * combining aggregate cannot express (the EWMA precedent), so the
    * calendar-bounded daily series collects into ONE sorted list and
    * folds once with a STRUCT accumulator; both engines seed with the
    * first element and run the identical float expression tree, so the
    * final state hash-matches. α=β=1/2 keeps every coefficient an exact
    * binary double.
    *
    * Scale shape: facts reduce to O(days) rows FIRST (the autocorr
    * argument — the collect_list is calendar-bounded, never data-
    * bounded); the cutoff is a 1-row broadcast cross; the holdout join
    * is days-sized.
    */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(datediff(col("o_orderdate").cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(LongType).as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
    val cut = daily.agg((max(col("day")) - HoltHorizon).as("cutoff"))
    // the (level, trend) state is a 2-element ARRAY, not a struct: DuckDB's
    // list_reduce mutates a struct accumulator FIELD BY FIELD, so a later
    // field's `a.l` reads the already-updated level (probed and pinned in
    // the oracle comment) — array-typed state folds correctly
    val fit = daily.join(broadcast(cut))
      .filter(col("day") <= col("cutoff"))
      .groupBy(col("cutoff"))
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("s"))
      .withColumn("ss", expr(
        "transform(s, e -> array(CAST(e.x AS DOUBLE), CAST(0.0 AS DOUBLE)))"))
      .withColumn("st", expr(
        """aggregate(slice(ss, 2, size(ss) - 1), ss[0], (a, e) -> array(
          |  0.5D * e[0] + 0.5D * (a[0] + a[1]),
          |  0.5D * (0.5D * e[0] + 0.5D * (a[0] + a[1]) - a[0]) + 0.5D * a[1]))""".stripMargin))
      .select(col("cutoff"),
        expr("st[0]").as("level"), expr("st[1]").as("trend"))
    val forecasts = fit
      .select(col("cutoff"), col("level"), col("trend"),
        explode(sequence(lit(1L), lit(HoltHorizon))).as("h"))
      .select(col("h"), (col("cutoff") + col("h")).as("day"),
        (col("level") + col("h").cast(DoubleType) * col("trend")).as("forecast_cents"))
    forecasts.join(daily.select(col("day"), col("x").as("actual_cents")), Seq("day"))
      .select(col("h").cast(IntegerType).as("h"), col("day"),
        col("actual_cents"), col("forecast_cents"),
        abs(col("actual_cents").cast(DoubleType) - col("forecast_cents")).as("abs_err"))
      .orderBy(col("h"))
  }

  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    require(BootReps <= 32, "one md5 digest supplies at most 32 hex-digit weights")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast(StringType).as("k"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
    val reps = o
      .select(md5(col("k")).as("d"), col("cents"),
        explode(sequence(lit(0L), lit(BootReps - 1))).as("rep"))
      .withColumn("w",
        expr(s"CAST(conv(substring(d, CAST(rep + 1 AS INT), 1), 16, 10) AS BIGINT) % $BootWMod"))
      .groupBy(col("rep"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("cents")).as("swc"))
      .select(col("rep"),
        (col("swc").cast(DoubleType) / nullif(col("sw"), lit(0L)).cast(DoubleType))
          .as("rep_mean"))
    val point = o.agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("s"))
    val stats = reps.agg(
        count(lit(1)).as("n_reps"),
        sort_array(collect_list(col("rep_mean"))).as("means"))
      .withColumn("m_bar",
        expr("aggregate(means, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
          / col("n_reps").cast(DoubleType))
      .select(col("n_reps"),
        element_at(col("means"), 2).as("ci_lo"),
        element_at(col("means"), (BootReps - 1).toInt).as("ci_hi"),
        sqrt(expr("aggregate(means, CAST(0.0 AS DOUBLE), (a, x) -> a + (x - m_bar) * (x - m_bar))")
          / (col("n_reps") - 1).cast(DoubleType)).as("boot_se"))
    point.join(broadcast(stats))
      .select(col("n_rows"), col("n_reps"),
        (col("s").cast(DoubleType) / col("n_rows").cast(DoubleType))
          .as("point_mean_cents"),
        col("boot_se"), col("ci_lo"), col("ci_hi"))
  }

  // ------------------------------- log-log price elasticity per brand
  /** Per-brand price elasticity of demand — the OLS slope of
    * ln(quantity) on ln(price) over line items, the econometric read a
    * pricing pipeline runs per product family. Both logs take INTEGER
    * arguments (cents and unit counts) quantized to the 2^20 grid, so
    * every regression moment is an exact integer/DECIMAL(38,0) sum; the
    * slope and intercept are the closed-form double expressions the OLS
    * tier pins (HUGEINT moments cross the engine boundary through the
    * simpsons VARCHAR detour). Shape: one fact pass joined to the part
    * dim for the brand key, moments combine map-side, O(brands) rows
    * after the aggregate.
    */
  def elasticity(spark: SparkSession, dir: String): DataFrame = {
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5)).cast(LongType)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        lnq((col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast(LongType)).as("x"),
        lnq(col("l_quantity").cast(LongType)).as("y"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val m = li.groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"))
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val slope = (dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")) /
      nullif(dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"), lit(0.0))
    m.select(col("brand"), col("n"), slope.as("elasticity"),
        ((dbl("sy") - slope * dbl("sx")) / dbl("n") / lit(LogScale.toDouble))
          .as("intercept"))
      .orderBy(col("brand"))
  }

  // --------------------------- leave-one-segment-out influence (LOO)
  /** Data-valuation by leave-one-segment-out: how much does each order
    * segment MOVE the corpus-wide trend? The metric is the pooled OLS
    * slope of order value over time; removing a segment re-derives the
    * slope from pooled-minus-segment moments — moments are ADDITIVE, so
    * the whole LOO sweep costs ZERO extra scans (the pooled-moments
    * discipline: one scan to segment grain, everything above
    * re-aggregates). Influence = slope_full − slope_loo: positive means
    * the segment was pulling the trend UP. Every subtraction happens on
    * exact integer/DECIMAL(38,0) moments; the two slopes are the same
    * closed-form double expression the OLS tier already pins.
    *
    * This is the cheap end of the data-attribution ladder (full Shapley
    * needs 2^k subsets; LOO is the standard first read a corpus owner
    * runs before pruning a source) — and at 100 TB it is STILL one fact
    * pass, because the sweep runs on O(segments) moment rows.
    */
  def looInfluence(spark: SparkSession, dir: String): DataFrame = {
    val m = segmentMoments(spark, dir)
    val pooled = m.agg(sum(col("n")).as("p_n"), sum(col("sx")).as("p_sx"),
      sum(col("sy")).as("p_sy"), sum(col("sxy")).as("p_sxy"),
      sum(col("sxx")).as("p_sxx"))
    m.crossJoin(broadcast(pooled))
      .withColumn("l_n", col("p_n") - col("n"))
      .withColumn("l_sx", col("p_sx") - col("sx"))
      .withColumn("l_sy", col("p_sy") - col("sy"))
      .withColumn("l_sxy", col("p_sxy") - col("sxy"))
      .withColumn("l_sxx", col("p_sxx") - col("sxx"))
      .select(col("segment"), col("n"),
        slopeOf("p_").as("slope_full"),
        slopeOf("l_").as("slope_loo"),
        (slopeOf("p_") - slopeOf("l_")).as("influence"))
      .orderBy(col("segment"))
  }

  // ------------------------- hard-assignment EM (2-component mixture)
  /** EM rounds after the min/max-midpoint init — fixed and unrolled in
    * the oracle (the kmeans two-Lloyd-rounds convention). */
  private[graft] val GmmRounds = 2

  /** Two-component 1-D Gaussian mixture over order prices by
    * CLASSIFICATION EM (hard assignments — the CEM variant of EM that
    * stays inside this repo's exactness contract): the E-step assigns
    * each order to the component minimizing the −2·log-likelihood score
    *   ln σ_c² − 2·ln π_c + (x − μ_c)²/σ_c²
    * where every input to the score is an EXACT integer moment of the
    * previous round — with μ_c = s_c/n_c and σ_c² = m_c/n_c²
    * (m_c = n_c·Σx² − s_c², DECIMAL(38,0)/HUGEINT), the quadratic term
    * collapses to the exact rational (n_c·x − s_c)²/m_c, and the log
    * terms quantize as lnq(m_c) − 4·lnq(n_c) + 2·lnq(n) on the 2^20
    * grid (integer arguments only). The score is ONE identically-written
    * per-row double expression — floats never cross rows; the M-step is
    * a conditional-sum combining aggregate back to exact integers.
    * Init splits at the integer midpoint 2x ≤ min+max; ties assign to
    * component 1 in both engines. Output: per component, its size,
    * mixing weight, mean price, and standard deviation — the
    * distribution-decomposition read (e.g. a retail/wholesale price
    * split) a profiling pass feeds segmentation.
    *
    * Scale shape: each round is ONE map-only scan of the cents column
    * against a broadcast 1-row moment cross, then one combining
    * aggregate — [[GmmRounds]]+2 linear passes total, no window, no
    * pair join, state is 7 integers. Degenerate corpora that empty a
    * component (ln 0) are outside the contract, as with the IVF
    * zero-norm centroid.
    */
  def gmmHard(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5)).cast(LongType)
    val x = Tables.orders(spark, dir)
      .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast(LongType).as("x"))
    val mm = x.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    def moments(assigned: DataFrame): DataFrame = assigned.agg(
      count(lit(1)).as("nn"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c") === 1, col("x")).otherwise(0L)).as("s1"),
      sum(when(col("c") === 1, col("x").cast(dec) * col("x"))
        .otherwise(lit(0).cast(dec))).as("q1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("c") === 2, col("x")).otherwise(0L)).as("s2"),
      sum(when(col("c") === 2, col("x").cast(dec) * col("x"))
        .otherwise(lit(0).cast(dec))).as("q2"))
    def mC(i: Int): Column =
      (col(s"n$i").cast(dec) * col(s"q$i") - col(s"s$i").cast(dec) * col(s"s$i"))
    def score(i: Int): Column = {
      val quadNum = {
        val t = col(s"n$i").cast(dec) * col("x").cast(dec) - col(s"s$i").cast(dec)
        t * t
      }
      (lnq(col(s"m$i")) - lit(4L) * lnq(col(s"n$i")) + lit(2L) * lnq(col("nn")))
        .cast(DoubleType) / lit(LogScale.toDouble) +
        quadNum.cast(DoubleType) / col(s"m$i").cast(DoubleType)
    }
    var cur = x.crossJoin(broadcast(mm))
      .select(col("x"),
        when(lit(2L) * col("x") <= col("mn") + col("mx"), 1).otherwise(2).as("c"))
    for (_ <- 1 to GmmRounds) {
      val st = moments(cur)
        .withColumn("m1", mC(1)).withColumn("m2", mC(2))
      cur = x.crossJoin(broadcast(st))
        .select(col("x"), when(score(1) <= score(2), 1).otherwise(2).as("c"))
    }
    val fin = moments(cur)
      .withColumn("m1", mC(1)).withColumn("m2", mC(2))
    def side(i: Int): DataFrame = fin.select(
      lit(i).as("component"), col(s"n$i").as("n"),
      (col(s"n$i").cast(DoubleType) / col("nn").cast(DoubleType)).as("weight"),
      (col(s"s$i").cast(DoubleType) / col(s"n$i").cast(DoubleType) / lit(100.0))
        .as("mean_price"),
      (sqrt(col(s"m$i").cast(DoubleType) / col(s"n$i").cast(DoubleType) /
        col(s"n$i").cast(DoubleType)) / lit(100.0)).as("sd_price"))
    side(1).unionByName(side(2)).orderBy(col("component"))
  }

  // ----------------------------- coarsened exact matching (CEM) ATT
  /** Coarsened-exact-matching treatment-effect estimate (Iacus, King &
    * Porro's CEM, the matching estimator that stays EXACT-arithmetic
    * friendly): users coarsen into strata by three pre-treatment
    * activity covariates (click / view / signup counts, each cut at the
    * corpus mean by integer cross-multiplication — nu·x > Σx, the
    * adaptive-cut discipline, so the strata never collapse as data
    * grows), treatment is above-mean ERROR exposure on the same adaptive
    * cut, and the outcome is exact purchase cents. Strata missing either
    * group are PRUNED (the defining CEM step); each matched stratum
    * reports group means and their difference, plus the pooled ATT —
    * the n_treated-weighted mean of the stratum differences, folded in
    * stratum order (sort_array + aggregate ≡ list(... ORDER BY) +
    * list_reduce) so the one cross-row float sum is order-pinned.
    *
    * Scale shape: one fact pass to user grain (conditional-sum combining
    * aggregate), a 1-row totals cross to flag strata, one (stratum,
    * treat) aggregate — O(strata) rows from there, with the ATT a
    * broadcast 1-row cross back onto the report. No window, no pair
    * join; the covariate cuts re-aggregate from the user grain, never a
    * second fact scan.
    */
  def cemAtt(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
    val u = ev.groupBy(col("user_id")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
      sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
      sum(when(col("event_type") === "purchase", coalesce(col("cents"), lit(0L)))
        .otherwise(0L)).as("y_cents"))
    val tot = u.agg(count(lit(1)).as("nu"), sum(col("n_click")).as("tc"),
      sum(col("n_view")).as("tv"), sum(col("n_signup")).as("tsg"),
      sum(col("n_error")).as("te"))
    def cut(cnt: String, t: String): Column =
      when(col("nu") * col(cnt) > col(t), 1).otherwise(0)
    val f = u.crossJoin(broadcast(tot))
      .withColumn("stratum", (cut("n_click", "tc") * 4 + cut("n_view", "tv") * 2 +
        cut("n_signup", "tsg")).cast(IntegerType))
      .withColumn("treat", cut("n_error", "te"))
    val g = f.groupBy(col("stratum"), col("treat"))
      .agg(count(lit(1)).as("n"), sum(col("y_cents")).as("sy"))
    val t = g.filter(col("treat") === 1)
      .select(col("stratum"), col("n").as("n_treated"), col("sy").as("syt"))
    val c = g.filter(col("treat") === 0)
      .select(col("stratum"), col("n").as("n_control"), col("sy").as("syc"))
    val d = t.join(c, Seq("stratum"))
      .withColumn("mean_y_treated",
        col("syt").cast(DoubleType) / col("n_treated").cast(DoubleType) / lit(100.0))
      .withColumn("mean_y_control",
        col("syc").cast(DoubleType) / col("n_control").cast(DoubleType) / lit(100.0))
      .withColumn("diff", col("mean_y_treated") - col("mean_y_control"))
    val att = d.agg(sum(col("n_treated")).as("den"),
        sort_array(collect_list(struct(col("stratum"),
          (col("n_treated").cast(DoubleType) * col("diff")).as("t")))).as("ts"))
      .select((aggregate(col("ts"), lit(0.0), (a, s) => a + s.getField("t")) /
        col("den").cast(DoubleType)).as("att"))
    d.crossJoin(broadcast(att))
      .select(col("stratum"), col("n_treated"), col("n_control"),
        col("mean_y_treated"), col("mean_y_control"), col("diff"), col("att"))
      .orderBy(col("stratum"))
  }

  // --------------------------------------- tie-averaged midranks (shared)
  /** Bucket width for [[midranks2]]'s two-level prefix sum — sized so a
    * bucket's distinct-value count (≤ width) fits one window partition. */
  private[graft] val MrBucketWidth = 65536L
  /** Literal clamp on the bucket id: `least(v div width, cap)` has a
    * domain of at most cap+1 values BY CONSTRUCTION, so the bucket-total
    * probe side is provably bounded (the PlanGuard broadcast rule) at any
    * data volume; cap·width = 2.7e8 cents covers the whole price domain,
    * so the overflow bucket is empty in practice. */
  private[graft] val MrBucketCap = 4096L

  /** Doubled tie-averaged midranks over a per-value count frame `(v, c)`
    * (v a non-negative long): returns `(v, c, rank2)` with
    * rank2 = 2·F_excl(v) + c + 1 — twice the midrank, so all rank
    * arithmetic downstream stays EXACT INTEGER (the mannWhitney
    * discipline). Built with the scalable two-level prefix-sum shape
    * ([[twoSampleCum]]): in-bucket cumsum is a window partitioned by a
    * LITERAL-CLAMPED bucket id, cross-bucket offsets come from the
    * triangular probe over the ≤[[MrBucketCap]]-row bucket-total
    * aggregate — never a global window, never a data-scale broadcast.
    */
  private[graft] def midranks2(perValue: DataFrame): DataFrame = {
    val pv = perValue.withColumn("bucket",
      least(expr(s"v div $MrBucketWidth"), lit(MrBucketCap)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = pv.withColumn("r", sum(col("c")).over(w))
    val totals = pv.groupBy(col("bucket")).agg(sum(col("c")).as("t"))
    val offsets = totals.select(col("bucket").as("b"))
      .join(broadcast(totals), col("bucket") < col("b"), "left")
      .groupBy(col("b"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("off"))
    inBucket.join(broadcast(offsets), col("bucket") === col("b"))
      .select(col("v"), col("c"),
        (lit(2L) * (col("off") + col("r") - col("c")) + col("c") + lit(1L))
          .as("rank2"))
  }

  // ------------------------------------------- Spearman rank correlation
  /** Spearman rank-correlation matrix over three lineitem measures —
    * [[corrMatrix]]'s robust sibling: monotone dependence instead of
    * linear, immune to the price tail. Ranks are tie-averaged DOUBLED
    * midranks (exact integers via [[midranks2]]; Pearson is affine-
    * invariant, so ρ over 2·rank equals ρ over rank), joined back to
    * rows by value — each rank table is |distinct values| ≤ the price
    * DOMAIN, so the joins are value-dimension-sized at any corpus scale.
    * The moment aggregate is ONE scan of exact integers (cross-moments
    * in DECIMAL(38,0): rank2² ≤ 4N², summed ≤ 4N³ ≈ 4e36 at N = 10¹²,
    * inside 38 digits), and each ρ is a closed-form double expression
    * over those moments (the corrMatrix contract).
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("discount", "extendedprice", "quantity")
    val li = Tables.lineitem(spark, dir).select(
      (col("l_quantity").cast(DecimalType(12, 2)) * 100).cast(LongType).as("quantity"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("extendedprice"),
      (col("l_discount").cast(DecimalType(12, 2)) * 100).cast(LongType).as("discount"))
    val withRanks = cols.foldLeft(li) { (df, c) =>
      val rt = midranks2(li.groupBy(col(c).as("v")).agg(count(lit(1)).as("c")))
        .select(col("v").as(c), col("rank2").as(s"r_$c"))
      df.join(rt, Seq(c))
    }
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val sums = Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(dec(col(s"r_$c"))).as(s"s_$c")) ++
      (for (x <- cols; y <- cols if x <= y) yield
        sum(dec(col(s"r_$x")) * col(s"r_$y")).as(s"s_${x}_$y"))
    val m = withRanks.agg(sums.head, sums.tail: _*)
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val pairs = for (x <- cols; y <- cols if x < y) yield {
      val num = dbl("n") * dbl(s"s_${x}_$y") - dbl(s"s_$x") * dbl(s"s_$y")
      val dx  = dbl("n") * dbl(s"s_${x}_$x") - dbl(s"s_$x") * dbl(s"s_$x")
      val dy  = dbl("n") * dbl(s"s_${y}_$y") - dbl(s"s_$y") * dbl(s"s_$y")
      struct(lit(x).as("x"), lit(y).as("y"),
        (num / nullif(sqrt(dx * dy), lit(0.0))).as("rho"))
    }
    m.select(col("n"), explode(array(pairs: _*)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"), col("n"),
        col("p.rho").as("rho"))
      .orderBy(col("x"), col("y"))
  }

  // ------------------------------------------------ Kruskal–Wallis H test
  /** Kruskal–Wallis H across the order-priority groups on order-total
    * cents — the rank-based one-way ANOVA ([[anova]]'s robust sibling;
    * [[mannWhitney]] generalized past two groups). Per-group rank sums
    * R_g stay EXACT (doubled midranks from [[midranks2]], accumulated in
    * DECIMAL(38,0)); H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) folds the ≤5
    * group terms in grp order (the anova fold, so the float sum is
    * order-pinned), and the tie correction C = 1 − Σ(t³−t)/(N³−N) reads
    * one more exact DECIMAL moment off the per-value count frame. Scale
    * shape: facts reduce to |distinct cents| rows + a 5-row group frame
    * before any float op; nothing downstream scales with data.
    */
  def kruskal(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderpriority").as("grp"),
      (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val rt = midranks2(o.groupBy(col("v")).agg(count(lit(1)).as("c")))
    val byGrp = o.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cg"))
      .join(rt.select(col("v"), col("rank2")), Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("cg")).as("n_g"), sum(dec(col("cg")) * col("rank2")).as("r2_g"))
    val ties = rt.agg(
      (sum(dec(col("c")) * col("c") * col("c")) - sum(dec(col("c")))).as("t3"))
    def dbl(c: Column): Column = c.cast(DoubleType)
    val folded = byGrp.agg(
        count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sort_array(collect_list(struct(col("grp"),
          (dbl(col("r2_g")) * dbl(col("r2_g"))
            / (lit(4.0) * dbl(col("n_g")))).as("term")))).as("ts"))
      .select(col("k"), col("n"),
        aggregate(col("ts"), lit(0.0), (a, s) => a + s.getField("term")).as("s"))
    folded.crossJoin(broadcast(ties))
      .select(col("k"), col("n"), col("s"), dbl(col("t3")).as("t3d"),
        dbl(col("n")).as("nd"))
      .select(col("k"), col("n"),
        (lit(12.0) * col("s") / (col("nd") * (col("nd") + 1.0))
          - lit(3.0) * (col("nd") + 1.0)).as("h"),
        (lit(1.0) - col("t3d")
          / (col("nd") * col("nd") * col("nd") - col("nd"))).as("tie_c"))
      .select(col("k"), col("n"), col("h"), col("tie_c"),
        (col("h") / nullif(col("tie_c"), lit(0.0))).as("h_adj"))
  }

  // ------------------------------------------ lead–lag cross-correlation
  /** Lag window for [[xcorr]] (shared with the oracle SQL). */
  private[graft] val XcMaxLag = 7L
  /** The two cross-correlated event streams. */
  private[graft] val XcTypeA = "view"
  private[graft] val XcTypeB = "purchase"

  /** Lead–lag cross-correlation between the daily [[XcTypeA]] and
    * [[XcTypeB]] event-count series at lags −[[XcMaxLag]]..+[[XcMaxLag]]
    * — [[autocorr]]'s two-series sibling, the "do views lead purchases?"
    * read. Positive lag correlates x(day) with y(day+lag). Per lag the
    * Pearson cross-moments accumulate in DECIMAL(38,0) — the oracle
    * widens to HUGEINT, and at ~3e9 events/day x·x would silently wrap
    * a non-ANSI int64 while DuckDB stayed exact (ADVICE r12) — so both
    * engines are exact until the single final double division. Moments
    * are assembled by ONE days-sized lagged equi-join; both daily frames
    * are calendar-bounded aggregates, so the probe side broadcasts
    * legitimately at any scale.
    */
  def xcorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin(XcTypeA, XcTypeB))
      .select(col("event_type"),
        datediff(col("ts").cast(DateType), lit("2024-01-01").cast(DateType))
          .cast(LongType).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    val a = daily.filter(col("event_type") === XcTypeA)
      .select(col("day"), col("cnt").as("x"))
    val b = daily.filter(col("event_type") === XcTypeB)
      .select(col("day").as("dayb"), col("cnt").as("y"))
    val lagged = a
      .select(col("day"), col("x"),
        explode(sequence(lit(-XcMaxLag), lit(XcMaxLag))).as("lag"))
      .select(col("lag"), (col("day") + col("lag")).as("probe"), col("x"))
    // DECIMAL(19,0) × int64 → DECIMAL(38,0): exact at any daily volume,
    // mirroring the oracle's CAST(x AS HUGEINT) * y (ADVICE r12)
    def wide(c: String): Column = col(c).cast(DecimalType(19, 0))
    val m = lagged.join(broadcast(b), col("probe") === col("dayb"))
      .groupBy(col("lag")).agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(wide("x") * col("y")).as("sxy"),
        sum(wide("x") * col("x")).as("sxx"),
        sum(wide("y") * col("y")).as("syy"))
    def dbl(c: String): Column = col(c).cast(DoubleType)
    val num = dbl("n_pairs") * dbl("sxy") - dbl("sx") * dbl("sy")
    val dx  = dbl("n_pairs") * dbl("sxx") - dbl("sx") * dbl("sx")
    val dy  = dbl("n_pairs") * dbl("syy") - dbl("sy") * dbl("sy")
    m.select(col("lag"), col("n_pairs"),
        (num / nullif(sqrt(dx * dy), lit(0.0))).as("xcorr"))
      .orderBy(col("lag"))
  }

  // -------------------------------------------- Theil–Sen robust slope
  /** Theil–Sen median slope of monthly revenue per market segment — the
    * outlier-robust trend estimate (breakdown point 29%) beside
    * [[olsFit]]'s least-squares one. Facts reduce to the (segment,
    * month) revenue frame FIRST — ≤ segments × months rows, calendar-
    * bounded — so the triangular month-pair self-join is O(months²) per
    * segment at any data volume, never data-scale. Each pairwise slope
    * is ONE double division of exact integer cents/month deltas
    * (identical in both engines); the median is selected by rank with a
    * (slope, mi1, mi2) ordering — the lower median at even counts, so
    * no cross-pair float arithmetic ever happens.
    */
  def theilsen(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"),
        ((year(col("o_orderdate").cast(DateType)) - 1992) * 12
          + month(col("o_orderdate").cast(DateType)) - 1).cast(LongType).as("mi"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("seg"), col("mi")).agg(sum(col("cents")).as("cents"))
    val a = monthly.select(col("seg"), col("mi").as("mi1"), col("cents").as("c1"))
    val b = monthly.select(col("seg"), col("mi").as("mi2"), col("cents").as("c2"))
    val pairs = a.join(broadcast(b), Seq("seg")).filter(col("mi1") < col("mi2"))
      .select(col("seg"), col("mi1"), col("mi2"),
        ((col("c2") - col("c1")).cast(DoubleType)
          / (col("mi2") - col("mi1")).cast(DoubleType)).as("slope"))
    val w = Window.partitionBy(col("seg"))
      .orderBy(col("slope"), col("mi1"), col("mi2"))
    val counted = pairs.withColumn("rn", row_number().over(w).cast(LongType))
    val sizes = monthly.groupBy(col("seg")).agg(count(lit(1)).as("n_months"))
      .withColumn("n_pairs", expr("n_months * (n_months - 1) div 2"))
    counted.join(broadcast(sizes), Seq("seg"))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("seg"), col("n_months"), col("n_pairs"),
        col("slope").as("median_slope"))
      .orderBy(col("seg"))
  }

  // --------------------------- Holt–Winters seasonal smoothing backtest
  /** Seasonal period (day-of-week) for [[holtWinters]]. */
  private[graft] val HwPeriod = 7L
  /** Holdout horizon (days) for the backtest. */
  private[graft] val HwHorizon = 7L

  /** The Holt–Winters fold-step array elements with the given index base
    * (0 = Spark arrays, 1 = DuckDB lists) — ONE generator feeds both the
    * entry and its oracle, so the two engines run the textually-identical
    * float expression tree. State layout: [level, trend, s₀..s₆, scratch];
    * each element carries [x, 0×8, day], so the FIRST element doubles as
    * the seed state (level = x₀, trend and seasons 0 — the holt idiom).
    * α = β = γ = 1/2 keeps every coefficient an exact binary double.
    */
  private[graft] def hwStepExprs(base: Int): Seq[String] = {
    def a(i: Int) = s"a[${i + base}]"
    def e(i: Int) = s"e[${i + base}]"
    val half = "CAST(0.5 AS DOUBLE)"
    val idx  = s"(CAST(${e(9)} AS BIGINT) % $HwPeriod)"
    val sold = s"a[CAST($idx AS INT) + ${2 + base}]"
    val lvlP = s"($half * (${e(0)} - $sold) + $half * (${a(0)} + ${a(1)}))"
    val trP  = s"($half * ($lvlP - ${a(0)}) + $half * ${a(1)})"
    val sP   = s"($half * (${e(0)} - $lvlP) + $half * $sold)"
    Seq(lvlP, trP) ++
      (0 until HwPeriod.toInt).map(i =>
        s"CASE WHEN $idx = $i THEN $sP ELSE ${a(2 + i)} END") :+
      "CAST(0.0 AS DOUBLE)"
  }

  /** Holt–Winters additive triple-exponential smoothing (level + trend +
    * day-of-week seasonality, α=β=γ=1/2) backtested on the daily
    * order-total series — [[holt]] upgraded with the weekly component,
    * the forecast shape a volume monitor actually needs. The recursion is
    * the same ordered fold a combining aggregate cannot express: the
    * calendar-bounded daily series collects into ONE sorted list and
    * folds once with a 10-slot double-array state (struct states mutate
    * field-by-field in DuckDB's list_reduce — the holt finding — so the
    * state stays an array); [[hwStepExprs]] guarantees both engines run
    * the identical expression tree, so the forecasts hash-match.
    * Scale shape: facts reduce to O(days) rows FIRST; the fold runs on
    * one row; the holdout join is days-sized.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(datediff(col("o_orderdate").cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(LongType).as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
    val cut = daily.agg((max(col("day")) - HwHorizon).as("cutoff"))
    val zeros = Seq.fill(8)("CAST(0.0 AS DOUBLE)").mkString(", ")
    val merge = hwStepExprs(0).mkString("array(", ", ", ")")
    val fit = daily.join(broadcast(cut))
      .filter(col("day") <= col("cutoff"))
      .groupBy(col("cutoff"))
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("s"))
      .withColumn("ss", expr(
        s"transform(s, p -> array(CAST(p.x AS DOUBLE), $zeros, CAST(p.day AS DOUBLE)))"))
      .withColumn("st", expr(
        s"aggregate(slice(ss, 2, size(ss) - 1), ss[0], (a, e) -> $merge)"))
    fit
      .select(col("cutoff"), col("st"),
        explode(sequence(lit(1L), lit(HwHorizon))).as("h"))
      .select(col("h"), (col("cutoff") + col("h")).as("day"),
        (expr("st[0]") + col("h").cast(DoubleType) * expr("st[1]")
          + expr(s"st[CAST((cutoff + h) % $HwPeriod AS INT) + 2]"))
          .as("forecast_cents"))
      .join(daily.select(col("day"), col("x").as("actual_cents")), Seq("day"))
      .select(col("h").cast(IntegerType).as("h"), col("day"),
        col("actual_cents"), col("forecast_cents"),
        abs(col("actual_cents").cast(DoubleType) - col("forecast_cents")).as("abs_err"))
      .orderBy(col("h"))
  }

  // ------------------------------------------ decision stump (best split)
  /** Positive label for [[stump]]. */
  private[graft] val StumpPosPriority = "1-URGENT"

  /** Optimal 1-D decision-stump split per feature by Gini impurity — the
    * first step of every tree learner, run in-engine: for each distinct
    * feature value v, evaluate the split "x ≤ v" against the binary label
    * and report the v minimizing weighted Gini (max gain, min-v
    * tiebreak). Per feature, the fact scan reduces to |distinct values|
    * (c, c1) rows; inclusive cumulative counts come from the two-level
    * prefix-sum shape (in-bucket window partitioned by the clamped
    * bucket id + triangular offset probe — the [[midranks2]] discipline,
    * keyed by feature); the split objective A/n_L + B/n_R (A, B the
    * per-side squared class masses) is two correctly-rounded double
    * divisions of EXACT integers, identical in both engines, and the
    * argmax resolves by equi-joining the per-feature max back (min-v
    * tiebreak — the ksTest shape). Gini is rational, so no logarithms
    * ever enter.
    */
  def stump(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"),
      datediff(col("o_orderdate").cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(LongType).as("day"),
      when(col("o_orderpriority") === StumpPosPriority, 1L).otherwise(0L).as("y"))
    stumpFeature(o.select(col("cents").as("v"), col("y")), "totalprice_cents")
      .unionByName(stumpFeature(o.select(col("day").as("v"), col("y")), "order_day"))
      .orderBy(col("feature"))
  }

  /** The single-feature split search over a `(v, y)` frame — run per
    * feature (not melted) so every broadcast side's grouping key is the
    * literal-clamped bucket id or a global aggregate, both provably
    * bounded. */
  private[graft] def stumpFeature(fv: DataFrame, name: String): DataFrame = {
    val pv = fv.groupBy(col("v"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("c1"))
      .withColumn("bucket", least(expr(s"v div $MrBucketWidth"), lit(MrBucketCap)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = pv
      .withColumn("r", sum(col("c")).over(w))
      .withColumn("r1", sum(col("c1")).over(w))
    val bucketTotals = pv.groupBy(col("bucket"))
      .agg(sum(col("c")).as("t"), sum(col("c1")).as("t1"))
    val offsets = bucketTotals.select(col("bucket").as("b"))
      .join(broadcast(bucketTotals), col("bucket") < col("b"), "left")
      .groupBy(col("b"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("off"),
        coalesce(sum(col("t1")), lit(0L)).as("off1"))
    val cum = inBucket.join(broadcast(offsets), col("bucket") === col("b"))
      .select(col("v"),
        (col("off") + col("r")).as("f"), (col("off1") + col("r1")).as("f1"))
    val totals = cum.agg(max(col("f")).as("n"), max(col("f1")).as("n1"))
    def dbl(c: Column): Column = c.cast(DoubleType)
    def sq2(a: Column, b: Column): Column = dbl(a) * dbl(a) + dbl(b) * dbl(b)
    // nullif, not bare denominators: CombineFilters can substitute this
    // projection into the f < n predicate and evaluate it on the f = n
    // row first — a bare ANSI divide would raise there (observed)
    val scored = cum.crossJoin(broadcast(totals))
      .filter(col("f") < col("n")) // the all-left "split" is no split
      .select(col("v"), col("n"), col("n1"), col("f"),
        (sq2(col("f1"), col("f") - col("f1")) / nullif(dbl(col("f")), lit(0.0))
          + sq2(col("n1") - col("f1"), (col("n") - col("f")) - (col("n1") - col("f1")))
            / nullif(dbl(col("n") - col("f")), lit(0.0))).as("score"))
    val best = scored.agg(max(col("score")).as("best_score"))
    scored.crossJoin(broadcast(best))
      .filter(col("score") === col("best_score"))
      .groupBy(col("n"), col("n1"), col("best_score"))
      .agg(min(col("v")).as("threshold"))
      .select(lit(name).as("feature"), col("n"), col("n1"), col("threshold"),
        // gain = gini(parent) - weighted-child gini
        //      = score/n - (n1^2 + n0^2)/n^2, both from exact ints
        (col("best_score") / dbl(col("n"))
          - sq2(col("n1"), col("n") - col("n1"))
            / (dbl(col("n")) * dbl(col("n")))).as("gini_gain"))
  }

  // ------------------------------------------------ Friedman blocked ranks
  /** Friedman χ² across event types (treatments) blocked by day — the
    * two-way rank test beside [[kruskal]]'s one-way: does any event type
    * systematically out-count the others day after day? Blocks are the
    * calendar-bounded (day × type) count grid restricted to COMPLETE
    * blocks (all k types present — deterministic in both engines); ranks
    * within a block are tie-averaged doubled midranks over k ≤ 5 rows (a
    * window partitioned BY DAY, never global), per-treatment rank sums
    * stay exact integers, and χ² = 12/(nk(k+1))·ΣR_j² − 3n(k+1) folds the
    * k treatment terms in type order (the anova fold). Tie correction
    * C = 1 − Σ(t³−t)/(nk(k²−1)) reads one more exact integer moment.
    */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast(DateType).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    val k = daily.agg(countDistinct(col("event_type")).as("k"))
    val complete = daily.groupBy(col("day")).agg(count(lit(1)).as("nt"))
      .join(broadcast(k), col("nt") === col("k"))
      .select(col("day"))
    val cells = daily.join(broadcast(complete), Seq("day"))
    val wcnt = Window.partitionBy(col("day")).orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // doubled midrank within the block: per (day, cnt) the tied group
    // shares 2*F_excl + t + 1
    val perVal = cells.groupBy(col("day"), col("cnt")).agg(count(lit(1)).as("t"))
      .withColumn("fincl", sum(col("t")).over(wcnt))
      .select(col("day"), col("cnt"),
        (lit(2L) * (col("fincl") - col("t")) + col("t") + lit(1L)).as("rank2"),
        col("t"))
    val ranked = cells.join(perVal.select(col("day"), col("cnt"), col("rank2")),
      Seq("day", "cnt"))
    val byType = ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("rank2")).as("r2"))
    def dbl(c: Column): Column = c.cast(DoubleType)
    val folded = byType.agg(
        count(lit(1)).as("k"), max(col("n_blocks")).as("n"),
        sort_array(collect_list(struct(col("event_type"),
          (dbl(col("r2")) * dbl(col("r2")) / lit(4.0)).as("term")))).as("ts"))
      .select(col("k"), col("n"),
        aggregate(col("ts"), lit(0.0), (a, s) => a + s.getField("term")).as("s"))
    val ties = perVal.agg(
      (sum(col("t").cast(DecimalType(38, 0)) * col("t") * col("t"))
        - sum(col("t").cast(DecimalType(38, 0)))).as("t3"))
    folded.crossJoin(broadcast(ties))
      .select(col("k"), col("n"), col("s"), dbl(col("t3")).as("t3d"),
        dbl(col("k")).as("kd"), dbl(col("n")).as("nd"))
      .select(col("k"), col("n"),
        (lit(12.0) * col("s") / (col("nd") * col("kd") * (col("kd") + 1.0))
          - lit(3.0) * col("nd") * (col("kd") + 1.0)).as("chi2"),
        (lit(1.0) - col("t3d")
          / (col("nd") * col("kd") * (col("kd") * col("kd") - 1.0))).as("tie_c"))
      .select(col("k"), col("n"), col("chi2"), col("tie_c"),
        (col("chi2") / nullif(col("tie_c"), lit(0.0))).as("chi2_adj"))
  }
}

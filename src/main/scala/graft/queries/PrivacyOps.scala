package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Privacy/compliance operators a training-data pipeline runs before any
  * text leaves the curation tier: PII detection/redaction and k-anonymity
  * generalization. Both are pure built-in column expressions (regex +
  * groupBy), fully codegen'd, no UDFs — at 100 TB, redaction is a map-only
  * pass and k-anonymity is two hash aggregates.
  */
object PrivacyOps {

  /** The three PII shapes, written in the regex dialect intersection of
    * Java (Spark) and RE2 (DuckDB oracle) — character classes, bounded
    * repetition, and \b only; no lookarounds or backreferences (RE2 has
    * neither).
    */
  private[queries] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[queries] val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  private[queries] val IpRe    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII detection + masking. The synthetic corpus is PII-free by
    * construction, so the entry derives a deterministic PII-laden contact
    * string from event columns (the sha-derived-multimodal precedent:
    * derivation from the driver tables, not invented rows) and then runs
    * the real operator — count matches per category, mask all of them.
    * Email is replaced first so the later numeric passes cannot eat a
    * digit run inside an address. A single map-side projection pass: no
    * shuffle, no collect, scan-parallel at any corpus size.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val contact = concat(
      lit("contact u"), col("user_id"),
      lit("@mail"), col("user_id") % 10, lit(".example.com"),
      when(col("event_type") === "signup",
        concat(lit(" alt u"), col("user_id"), lit(".alt@mail.example.org")))
        .otherwise(lit("")),
      when(col("event_type").isin("click", "view"),
        concat(lit(" call 555-"),
          lpad((col("event_id") % 10000).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      lit(" from 10."), col("user_id") % 256, lit(".0."), col("event_id") % 256)
    Tables.events(spark, dir)
      .select(col("event_id"), contact.as("contact"))
      .select(
        col("event_id"),
        col("contact"),
        size(regexp_extract_all(col("contact"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("contact"), lit(PhoneRe), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("contact"), lit(IpRe), lit(0))).as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("contact"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          IpRe, "<IP>").as("redacted"))
      .orderBy(col("event_id"))
  }

  /** k-anonymity releasability with one generalization step (the
    * Samarati/Sweeney ladder over a two-level hierarchy):
    *
    *  - level 1: quasi-identifier (event_type, hour, day-of-week); cells
    *    with >= k distinct users are released as-is.
    *  - level 2: cells failing level 1 are generalized — day-of-week
    *    coarsens to '*' — and re-tested over the UNION of their rows
    *    (distinct users re-counted from the base rows, NOT summed across
    *    cells: the same user can sit in several suppressed cells).
    *  - level 0: generalized cells still under k are withheld.
    *
    * Scale shape: two hash aggregates plus one semi-shaped join of the
    * base rows against the (bounded, |QI-domain|-sized) suppressed-cell
    * list — no windows, no driver-side state. k = [[KAnon]].
    */
  private[queries] val KAnon = 20

  def kanonRelease(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir).select(
      col("event_type"),
      hour(col("ts")).as("hour"),
      dayofweek(col("ts")).as("dow"),
      col("user_id"))
    val l1 = base.groupBy(col("event_type"), col("hour"), col("dow"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
    val rel1 = l1.filter(col("n_users") >= KAnon)
      .select(col("event_type"), col("hour"), col("dow").cast(StringType).as("dow"),
        col("n_events"), col("n_users"), lit(1).as("anon_level"))
    // suppressed level-1 cells, re-aggregated from base at (event_type, hour)
    val suppCells = l1.filter(col("n_users") < KAnon)
      .select(col("event_type"), col("hour"), col("dow"))
    val l2 = base.join(suppCells, Seq("event_type", "hour", "dow"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .select(col("event_type"), col("hour"), lit("*").as("dow"),
        col("n_events"), col("n_users"),
        when(col("n_users") >= KAnon, lit(2)).otherwise(lit(0)).as("anon_level"))
    rel1.unionByName(l2)
      .orderBy(col("event_type"), col("hour"), col("dow"))
  }

  // ------------------------------------ differentially-private counts
  /** Half-width of the symmetric integer noise grid (2^20). */
  private[graft] val DpHalfRange = 1L << 20
  /** Epsilon in milli-units (500 = ε 0.5). */
  private[graft] val DpEpsMilli = 500L
  /** L1 sensitivity of a per-source count (docs per contributor). */
  private[graft] val DpSensitivity = 1L
  /** Laplace scale b = sensitivity/ε, in milli-counts (2000 = b 2.0). */
  private[graft] val DpBMilli = DpSensitivity * 1000L * 1000L / DpEpsMilli

  /** DP-style noisy release of the per-source document counts — the
    * Laplace mechanism with the repo's DETERMINISTIC pseudo-noise replica
    * (the calibration/bootstrap discipline: an md5-derived symmetric
    * integer stands in for the RNG draw; a real mechanism's sampler drops
    * in unchanged). The draw v is uniform on [−M, M−1]; the magnitude
    * b·ln(M/(|v|+1)) is the inverse-CDF tail with the logarithm QUANTIZED
    * on integer arguments (lnq discipline — both engines floor the same
    * integer-log grid, so noise is bit-identical), clamped at 0 for the
    * |v| = M edge. Scale shape: one enum-keyed combining aggregate, then
    * O(sources) scalar arithmetic — map-only at any corpus size.
    */
  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    val ls = StatsOps.LogScale
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(ls.toDouble) + lit(0.5)).cast(LongType)
    Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_true"))
      .withColumn("v",
        (TextOps.h32(concat(lit("dp|"), col("source"))) % lit(2 * DpHalfRange))
          - lit(DpHalfRange))
      .withColumn("mag",
        greatest(lnq(lit(DpHalfRange)) - lnq(abs(col("v")) + 1), lit(0L)))
      .withColumn("noise_milli",
        when(col("v") < 0, lit(-1L)).otherwise(lit(1L))
          * expr(s"($DpBMilli * mag) div $ls"))
      .select(col("source"), col("n_true"), col("noise_milli"),
        ((col("n_true") * 1000 + col("noise_milli")).cast(DoubleType)
          / lit(1000.0)).as("n_released"),
        // epsilon_NOMINAL + deterministic_replica: the output table itself
        // says no real privacy guarantee is conferred — the noise is an
        // md5-derived replica, not an RNG draw (ADVICE r12: a downstream
        // consumer must not read a bare `epsilon` as a real guarantee)
        lit(DpEpsMilli.toDouble / 1000.0).as("epsilon_nominal"),
        lit(true).as("deterministic_replica"))
      .orderBy(col("source"))
  }

  /** Nominal sensitivity of the median utility u = −|2·cum − n| (one
    * record moves cum by ≤1 and n by 1). Shares [[DpEpsMilli]]'s
    * NOMINAL honesty contract. */
  private[graft] val DpUSens = 2L

  /** DP median selection per event type — report-noisy-max over the
    * value-bin domain (the selection-query complement to [[dpCounts]]'
    * counting query; together they are the two primitive DP shapes):
    * utility u(bin) = −|2·cum(bin) − n| peaks at the median bin, each
    * candidate's score gets the [[dpCounts]] deterministic truncated-
    * Laplace replica at scale 2·Δu/ε (Laplace noisy-max), and the
    * released value is the argmax. The released and true median bins are
    * reported side by side with `epsilon_nominal` + `deterministic_
    * replica` — the same no-real-guarantee honesty flags as dpCounts.
    *
    * Scale shape: one corpus-scale combining groupBy to (type, bin)
    * counts; everything after runs on the literal (types × [[graft.
    * queries.StatsOps.PsiBins]]) spine — prefix sums, utilities, noise,
    * and BOTH argmaxes are windows PARTITIONED BY TYPE over ≤8 rows
    * each. All integer arithmetic: the score comparison is
    * u·1000 + noise_milli·2Δu (the ε/(2Δu) factor multiplied through,
    * so no division — signed integer division is the one op the two
    * engines round differently).
    */
  def dpMedian(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.StatsOps.{LogScale, PsiBinCents, PsiBins}
    import org.apache.spark.sql.expressions.Window
    def lnq(c: Column): Column =
      floor(log(c.cast(DoubleType)) * lit(LogScale.toDouble) + lit(0.5)).cast(LongType)
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .withColumn("bin", greatest(least(
        expr(s"CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div $PsiBinCents"),
        lit(PsiBins - 1)), lit(0L)))
    val c = e.groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("c"))
    val spine = c.select(col("event_type")).distinct()
      .withColumn("bin", explode(expr(s"sequence(0L, ${PsiBins - 1}L)")))
    val cumW = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = spine.join(c, Seq("event_type", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .withColumn("u", -abs(col("cum") * 2 - col("n")))
      .withColumn("v",
        (TextOps.h32(concat(lit("dpm|"), col("event_type"), lit("|"),
          col("bin").cast(StringType))) % lit(2 * DpHalfRange)) - lit(DpHalfRange))
      .withColumn("mag",
        greatest(lnq(lit(DpHalfRange)) - lnq(abs(col("v")) + 1), lit(0L)))
      .withColumn("noise_milli",
        when(col("v") < 0, lit(-1L)).otherwise(lit(1L))
          * expr(s"($DpBMilli * mag) div $LogScale"))
      .withColumn("noisy_milli",
        col("u") * 1000L + col("noise_milli") * lit(2 * DpUSens))
    // both argmaxes read ONE evaluation of the scored spine: the two
    // rank windows ride the same type partition, and a conditional
    // aggregate extracts both winners without a second pass (a filter
    // per winner would re-run the corpus groupBy per branch)
    val win = scored
      .withColumn("rn_noisy", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("noisy_milli").desc, col("bin"))))
      .withColumn("rn_true", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("u").desc, col("bin"))))
    win.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn_true") === 1, col("bin"))).as("true_median_bin"),
        max(when(col("rn_noisy") === 1, col("bin"))).as("released_bin"))
      .select(col("event_type"), col("n"), col("true_median_bin"),
        col("released_bin"), lit(PsiBinCents).as("bin_width_cents"),
        lit(DpEpsMilli.toDouble / 1000.0).as("epsilon_nominal"),
        lit(true).as("deterministic_replica"))
      .orderBy(col("event_type"))
  }

  /** Deterministic erasure cohort: 1-in-[[ForgetMod]] users by the keyed
    * hash — the batch of right-to-be-forgotten requests a compliance run
    * processes (hash-derived like every other synthetic driver here, so
    * both engines agree on the cohort without a side table). */
  private[graft] val ForgetMod = 20L

  /** Right-to-be-forgotten cascade audit (GDPR Art. 17): given the
    * erasure cohort, purge every event row belonging to a forgotten user
    * and report, per event type, what the purge did — rows purged, rows
    * kept, distinct users purged, distinct users kept — plus the
    * purge fraction. This is the COMPLIANCE EVIDENCE a deletion job must
    * emit: not just the post-delete table but an auditable account of
    * what was removed, at the grain regulators ask for.
    *
    * Scale shape: the cohort predicate is a pure hash expression on the
    * fact's own user column, so there is NO join at all — the cascade
    * "set" never materializes, the purge classification is map-only, and
    * one combining aggregate produces the audit (distinct-user counts
    * ride two-level groupBys, never an Expand). A real deployment with
    * an explicit request TABLE swaps the predicate for a semi-join
    * against user-scale keys — the [[graft.queries.CoreOps]] quarantine
    * shape — without touching the audit.
    */
  def forgetUser(spark: SparkSession, dir: String): DataFrame = {
    val purge = (TextOps.h32(concat(lit("forget|"),
      col("user_id").cast(StringType))) % ForgetMod === 0L).cast(IntegerType)
    val perUser = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .withColumn("purged", purge)
      .groupBy(col("event_type"), col("user_id"), col("purged"))
      .agg(count(lit(1)).as("n"))
    perUser.groupBy(col("event_type"))
      .agg(
        sum(when(col("purged") === 1, col("n")).otherwise(0L)).as("rows_purged"),
        sum(when(col("purged") === 0, col("n")).otherwise(0L)).as("rows_kept"),
        sum(col("purged").cast(LongType)).as("users_purged"),
        sum(lit(1L) - col("purged")).as("users_kept"))
      .withColumn("purge_frac",
        col("rows_purged").cast(DoubleType)
          / (col("rows_purged") + col("rows_kept")).cast(DoubleType))
      .orderBy(col("event_type"))
  }
}

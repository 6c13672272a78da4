package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}

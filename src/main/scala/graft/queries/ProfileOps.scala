package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Data-profiling operators — the catalog-building pass a pipeline runs
  * over an unfamiliar 100 TB corpus before it writes a single query:
  * sketch-based frequency estimation and join-key (FK) inference. Both
  * are exact-arithmetic and engine-portable: the sketch is md5-derived
  * integer hashing (same automaton both engines), the profiler is
  * distinct-set algebra on one full-outer join.
  */
object ProfileOps {

  private val Depths  = 4   // CMS rows (independent hash functions)
  private val Width   = 64L // CMS buckets per row

  /** Count-min-sketch heavy hitters over lineitem.l_partkey, audited
    * against the exact counts. The sketch state is DepthsxWidth = 256
    * cells regardless of data volume — built by one map-side-combinable
    * groupBy over a 4x depth explode — where the exact computation's
    * state is O(distinct keys). That fixed size is the 100 TB story:
    * cells merge associatively across any partitioning (the same
    * property BloomFunctions exploits), and heavy-hitter candidates are
    * then probed against 256 broadcast cells instead of re-scanning. The
    * entry probes ALL distinct keys so the oracle can audit the CMS
    * guarantee (est >= exact, overestimate = collision mass) key by key;
    * a production probe set would come from a sample or prior top-k.
    *
    * Top-10 by estimate (tie-broken by key) with the exact count and
    * overestimate beside — integer arithmetic end to end.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    cmsAudit(Tables.lineitem(spark, dir).select(col("l_partkey")), "l_partkey")
      .orderBy(col("est").desc, col("l_partkey"))
      .limit(10)

  /** CMS estimate vs exact count for every distinct value of `key` —
    * the unlimited audit frame behind [[heavyHitters]].
    *
    * All [[Depths]] hash functions come from ONE md5 digest per row: an
    * md5 is 32 hex chars, and 4 disjoint 8-char slices are 4 independent
    * 32-bit hashes. The naive form (md5 per (row, depth)) made digesting
    * the dominant cost of the build scan at sf0.1 — 4x the hashing for
    * zero extra information. One digest, [[Depths]] buckets; the DuckDB
    * oracle slices the same digest at the same offsets.
    */
  private[queries] def cmsAudit(df: DataFrame, key: String): DataFrame = {
    def buckets(k: Column): Column = array((0 until Depths).map { i =>
      conv(substring(md5(k.cast(StringType)), 1 + 8 * i, 8), 16, 10)
        .cast(LongType) % Width
    }: _*)
    // build: one digest per row, posexplode its 4 slices -> <=256 cells
    val cms = df.select(col(key), posexplode(buckets(col(key))).as(Seq("depth", "bucket")))
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
    // probe: each candidate's 4 (depth, bucket) coords -> min cell
    val exact = df.groupBy(col(key)).agg(count(lit(1)).as("exact"))
    exact.select(col(key), col("exact"),
        posexplode(buckets(col(key))).as(Seq("depth", "bucket")))
      .join(cms, Seq("depth", "bucket"))
      .groupBy(col(key), col("exact"))
      .agg(min(col("cell")).as("est"))
      .select(col(key), col("est"), col("exact"),
        (col("est") - col("exact")).as("overestimate"))
  }

  /** Join-key inference: for each candidate (child column, parent key)
    * pair, the distinct-set containment — what fraction of child values
    * exist in the parent. Containment 1.0 marks an FK candidate; the
    * deliberately-included events.user_id vs customer.c_custkey pair
    * shows a non-FK reading (user ids are not customer keys at every SF).
    *
    * Per pair: distinct-project both sides (map-side partial dedup),
    * one full-outer join with presence markers, one count aggregate —
    * no cross join, no collect. Work is O(distinct keys), not O(rows),
    * so profiling cost is set by key cardinality alone at any volume.
    */
  def fkProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val cu = Tables.customer(spark, dir)
    pair(li, "l_orderkey", "lineitem.l_orderkey", o, "o_orderkey", "orders.o_orderkey")
      .unionAll(pair(li, "l_partkey", "lineitem.l_partkey",
        Tables.part(spark, dir), "p_partkey", "part.p_partkey"))
      .unionAll(pair(o, "o_custkey", "orders.o_custkey", cu, "c_custkey", "customer.c_custkey"))
      .unionAll(pair(Tables.events(spark, dir), "user_id", "events.user_id",
        cu, "c_custkey", "customer.c_custkey"))
      .orderBy(col("child_col"), col("parent_col"))
  }

  /** Distributed ordinary-least-squares fit via exact integer moment
    * aggregates — the normal-equations shape, which is how a linear
    * scorer (a quality/length model, a drift baseline, a feature
    * calibration) trains at 100 TB: ONE map-side-combinable aggregate
    * collects (n, Σx, Σy, Σxy, Σx², Σy²) per group, and the closed-form
    * slope/intercept/R² are computed from those six numbers at the
    * O(groups)-sized output edge. No iteration, no gradient steps, no
    * driver-side data — the moments ARE the sufficient statistics, and
    * they merge associatively across any partitioning because they are
    * exact int64 sums (never a float accumulation — the q_dsir
    * arithmetic discipline).
    *
    * Fit here: n_chars ~ n_tokens per language over `documents` — the
    * chars-per-token line whose residual is a cheap gibberish signal.
    * int64 headroom: Σxy sums x·y ≈ 2e5 per doc; ~1e11 docs at 100 TB
    * stay ~2 orders under 2^63. The final arithmetic is double with a
    * FIXED association order — each moment cast once, every product and
    * difference mirrored verbatim in the oracle SQL — so both engines
    * round identically (the kmeans floor-division precedent). Degenerate
    * groups (constant x, or fewer than 2 rows) yield NULL slope/R² via
    * nullif, identically in both engines.
    */
  def olsFit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(TextOps.toksAll).cast(LongType).as("x"),
        col("n_chars").cast(LongType).as("y"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(Seq(col("lang"), col("n")) ++ {
        def dbl(c: String): Column = col(c).cast(DoubleType)
        val num = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
        val dn = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
        val dy = dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")
        val slope = num / nullif(dn, lit(0.0))
        Seq(
          slope.as("slope"),
          ((dbl("sy") - slope * dbl("sx")) / dbl("n")).as("intercept"),
          ((num * num) / nullif(dn * dy, lit(0.0))).as("r2"))
      }: _*)
      .orderBy(col("lang"))
  }

  /** One containment row for a (child column, parent key) pair. */
  private[queries] def pair(
      child: DataFrame, childCol: String, childName: String,
      parent: DataFrame, parentCol: String, parentName: String): DataFrame = {
      val c = child.select(col(childCol).as("k")).distinct()
        .withColumn("is_c", lit(1L))
      val p = parent.select(col(parentCol).as("k")).distinct()
        .withColumn("is_p", lit(1L))
      c.join(p, Seq("k"), "full_outer")
        .agg(
          sum(coalesce(col("is_c"), lit(0L))).as("n_child_keys"),
          sum(coalesce(col("is_p"), lit(0L))).as("n_parent_keys"),
          sum(coalesce(col("is_c"), lit(0L)) * coalesce(col("is_p"), lit(0L)))
            .as("n_matched"))
        .select(lit(childName).as("child_col"), lit(parentName).as("parent_col"),
          col("n_child_keys"), col("n_parent_keys"), col("n_matched"),
          (col("n_matched").cast(DoubleType) / col("n_child_keys"))
            .as("containment"),
          (col("n_matched") === col("n_child_keys")).as("is_fk_candidate"))
  }
}

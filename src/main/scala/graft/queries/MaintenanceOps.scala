package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Table-maintenance operators a lakehouse pipeline runs continuously:
  * CDC change-log application (the MERGE shape), key-skew diagnostics,
  * and small-file compaction planning. All three are plain DataFrame
  * plans — one key-shuffle for the merge, two-level hash aggregates for
  * the diagnostics — with O(partitions)-sized outputs, so they cost the
  * same per byte at 100 TB as at sf0.01.
  */
object MaintenanceOps {

  /** CDC merge-apply: reconcile a keyed snapshot with a change log where
    * the LATEST change per key wins and one change kind is a tombstone.
    * Extends the reference's keyed upsert (09_ETL3.sql ON CONFLICT DO
    * UPDATE, re-enacted in [[CoreOps.factUpsert]]) with the delete case
    * and last-writer-wins conflict resolution — the shape a
    * foreachBatch-MERGE sink applies per micro-batch.
    *
    * Snapshot = customers with key in [50, 300); change log = events
    * keyed by user_id (0–149), `error` = tombstone. The key ranges
    * overlap so all four outcomes occur: insert (change key not in
    * snapshot), update (latest change is a value), delete (latest change
    * is a tombstone), unchanged (snapshot key with no change).
    *
    * Plan: one window shuffle on user_id reduces the log to latest-per-
    * key, then a full-outer sort-merge join on the SAME key applies it —
    * the second shuffle reuses the first's partitioning. At 100 TB the
    * snapshot is bucketed by key and the per-batch log is small, so the
    * merge is a shuffle-free bucket join with an O(batch) probe side.
    */
  /** The keyed snapshot [[cdcApply]] merges into — shared with the
    * streaming `foreachBatch` CDC sink ([[graft.streaming.Streams.cdcSink]])
    * so the one-shot and micro-batched paths reconcile the SAME table. */
  private[graft] def cdcSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") >= 50 && col("c_custkey") < 300)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").as("snap_val"))

  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val snap = cdcSnapshot(spark, dir)
    // last-writer-wins: latest (ts, event_id) per key; ts ties are
    // impossible to rely on at ns truncation, so event_id breaks them
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val latest = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("ckey"), col("event_type").as("op"),
        col("value").as("chg_val"))
    snap.join(latest, col("key") === col("ckey"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "error") // tombstones drop
      .select(
        coalesce(col("key"), col("ckey")).as("key"),
        col("name"), // null for inserts: the log carries no name
        when(col("ckey").isNull, col("snap_val"))
          .otherwise(col("chg_val")).as("val"),
        when(col("ckey").isNull, lit("unchanged"))
          .when(col("key").isNull, lit("insert"))
          .otherwise(lit("update")).as("action"))
      .orderBy(col("key"))
  }

  /** Key-skew diagnostics over the three join/agg keys the engine
    * shuffles on most: per-key row counts summarized as exact p50/p99 and
    * a max/avg skew ratio. This is the measurement that DECIDES between
    * the plain, salted ([[ScaleOps.saltedJoin]]), and AQE plans — run it
    * before picking, not after the straggler appears.
    *
    * Each branch is two hash aggregates (groupBy key → count, then a
    * 1-row summary); map-side partials apply to both, and the exact
    * percentile sorts only n_keys counts, not n_rows. At 100 TB the
    * documented escape is `approx_percentile` (t-digest, mergeable) —
    * the same exact-vs-sketch trade as [[ScaleOps.quantiles]].
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame =
    keyCountReport(Tables.lineitem(spark, dir), "l_orderkey", "lineitem.l_orderkey")
      .unionAll(keyCountReport(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
      .unionAll(keyCountReport(Tables.events(spark, dir), "user_id", "events.user_id"))
      .orderBy(col("key_col"))

  /** One summary row for the per-key count distribution of `df[key]`. */
  private[queries] def keyCountReport(df: DataFrame, key: String, label: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        percentile(col("cnt").cast(DoubleType), lit(0.5)).as("p50_cnt"),
        percentile(col("cnt").cast(DoubleType), lit(0.99)).as("p99_cnt"),
        (max(col("cnt")).cast(DoubleType) /
          avg(col("cnt"))).as("skew_ratio"))
      .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
        col("max_cnt"), col("p50_cnt"), col("p99_cnt"), col("skew_ratio"))

  /** Snapshot-to-snapshot reconciliation (data diff): given two versions
    * of the documents table, classify every doc as added / removed /
    * changed / unchanged by content checksum and report counts per
    * (source, status) — the validation gate a pipeline runs between a
    * re-extraction and the corpus it replaces, before anything ships.
    * Versions are derived deterministically from the one driver table so
    * every SF exercises all four statuses: v1 omits doc_id ≡ 0 (mod 7),
    * v2 omits doc_id ≡ 0 (mod 13) and re-extracts (uppercases) doc_id ≡
    * 0 (mod 11).
    *
    * One full-outer join on doc_id (both sides co-partitioned on it)
    * comparing md5-derived checksums, then a hash aggregate — O(docs)
    * once, no second scan. At 100 TB both snapshots are bucketed by
    * doc_id and the join is shuffle-free; the checksum column is the
    * only payload carried, so shuffle bytes are O(docs × 8), not corpus
    * size.
    */
  def dataDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val v1 = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0L)
      .select(col("doc_id"), col("source"),
        TextOps.h32(col("text")).as("sum1"))
    val v2 = docs.filter(pmod(col("doc_id"), lit(13L)) =!= 0L)
      .select(col("doc_id"), col("source").as("source2"),
        TextOps.h32(when(pmod(col("doc_id"), lit(11L)) === 0L, upper(col("text")))
          .otherwise(col("text"))).as("sum2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source"), col("source2")).as("source"),
        when(col("sum1").isNull, lit("added"))
          .when(col("sum2").isNull, lit("removed"))
          .when(col("sum1") === col("sum2"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("status"))
  }

  /** Small-file compaction planning from partition stats: per
    * (source, lang) partition of the documents table, compare the current
    * file count against the count a target file size implies and emit the
    * saving. Current layout is simulated as one file per ingest batch
    * (batch = doc_id mod 20 — each micro-batch append wrote every
    * partition it touched), which is exactly how streaming sinks produce
    * the small-file problem this plan exists to undo.
    *
    * Pure integer arithmetic (ceil via (n + t − 1) div t) over one
    * two-level aggregate; the exact COUNT(DISTINCT batch) rides the same
    * shuffle as the sums. Output is O(partitions) — the plan itself never
    * grows with data volume, only with partition count.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val target = 65536L // target chars per compacted file
    Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(pmod(col("doc_id"), lit(20L))).as("files_now"))
      .withColumn("planned_files", // integer ceil: `/` on longs would be double division
        greatest(lit(1L), expr(s"(total_chars + ${target - 1}) DIV $target")))
      .withColumn("files_saved",
        greatest(lit(0L), col("files_now") - col("planned_files")))
      .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
        col("files_now"), col("planned_files"), col("files_saved"))
      .orderBy(col("source"), col("lang"))
  }

  /** Incremental view maintenance: refresh a stored GROUP BY aggregate
    * (per-customer order count + exact-decimal spend) under a batch of
    * inserts AND deletes by merging a SIGNED delta aggregate — the base
    * table is never rescanned. This is the algebra behind every
    * incrementally-maintained matview: count and SUM are abelian-group
    * aggregates, so `view ⊕ Σ(+insert) ⊖ Σ(-delete)` equals a full
    * recompute, and groups whose merged count reaches zero vanish.
    *
    * Delta partitioning of orders (arithmetic, deterministic): the stored
    * base is `o_orderkey % 7 != 0`; the batch INSERTS the `% 7 == 0` rows
    * and DELETES the base rows with `% 11 == 0`. The oracle recomputes
    * the final state from scratch (`% 7 == 0 OR % 11 != 0`), proving the
    * incremental algebra exact — including decimal sums, which stay in
    * DECIMAL until the final cast so accumulation order can't matter.
    *
    * The 100 TB story is the cost asymmetry this entry's plan makes
    * visible: the base aggregate here stands in for a STORED view, so a
    * refresh costs O(|delta| + |view|) — one shuffle of the (small)
    * delta to its group keys plus a key-colocated full-outer merge into
    * the view — while the oracle's recompute shape costs a full scan of
    * the 100 TB base. Deletes need no tombstone lookup: a -1 weight row
    * is enough, because subtraction is just addition of the inverse.
    */
  def ivmApply(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"))
    val base    = o.filter(col("o_orderkey") % 7 =!= 0)
    val inserts = o.filter(col("o_orderkey") % 7 === 0)
    val deletes = base.filter(col("o_orderkey") % 11 === 0)

    val view = base.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("price")).as("amt"))
    val delta = inserts.withColumn("w", lit(1L))
      .unionByName(deletes.withColumn("w", lit(-1L)))
      .groupBy(col("o_custkey"))
      .agg(sum(col("w")).as("dcnt"), sum(col("w") * col("price")).as("damt"))

    view.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L))).as("n_orders"),
        (coalesce(col("amt"), lit(BigDecimal(0)).cast(DecimalType(22, 2))) +
          coalesce(col("damt"), lit(BigDecimal(0)).cast(DecimalType(22, 2))))
          .as("amt_dec"))
      .filter(col("n_orders") > 0)
      .select(col("o_custkey"), col("n_orders"),
        col("amt_dec").cast(DoubleType).as("total_spend"))
      .orderBy(col("o_custkey"))
  }

  /** Incremental maintenance of a JOIN view (the [[ivmApply]] algebra
    * lifted from one table to two): the stored view is the aggregate over
    * orders ⋈ lineitem — per customer, matched-pair count and exact-
    * decimal quantity — refreshed under signed deltas on BOTH inputs
    * without rescanning either base. The delta of a join is the bilinear
    * expansion (A+ΔA)(B+ΔB) − AB = ΔA·B + A·ΔB + ΔA·ΔB with
    * multiplicities MULTIPLYING (so a pair losing both sides nets
    * −1−1+1 = −1, exactly once), and the aggregate merge is the same
    * full-outer signed merge as [[ivmApply]].
    *
    * Delta partitioning (arithmetic, deterministic): orders base is
    * `o_orderkey % 7 != 0`, inserts `% 7 == 0`, deletes `base && % 11 ==
    * 0`; lineitem base is `(l_orderkey + l_linenumber) % 13 != 0`,
    * inserts `% 13 == 0`, deletes `base && % 17 == 0`. The oracle
    * recomputes the view from the FINAL states of both tables, proving
    * the bilinear algebra exact — decimal sums stay DECIMAL to the edge.
    *
    * 100 TB shape: all three delta joins key on the join column, so they
    * share one partitioning (bucketed bases make ΔA·B / A·ΔB shuffle-
    * free probes with O(delta) probe sides — the layout_join_bucketed
    * upgrade); ΔA·ΔB is delta × delta; the view merge is O(|Δview| +
    * |view|). Nothing rescans a base table. */
  def ivmJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        col("l_quantity").cast(DecimalType(12, 2)).as("qty"))
    val baseO = o.filter(col("ok") % 7 =!= 0)
    val dO = o.filter(col("ok") % 7 === 0).withColumn("wa", lit(1L))
      .unionByName(baseO.filter(col("ok") % 11 === 0).withColumn("wa", lit(-1L)))
    val baseL = l.filter((col("ok") + col("ln")) % 13 =!= 0)
    val dL = l.filter((col("ok") + col("ln")) % 13 === 0).withColumn("wb", lit(1L))
      .unionByName(baseL.filter((col("ok") + col("ln")) % 17 === 0)
        .withColumn("wb", lit(-1L)))

    // the stored view (stands in for the persisted matview)
    val view = baseO.join(baseL, Seq("ok"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("sq"))
    // ΔA·B + A·ΔB + ΔA·ΔB, weights multiplying
    val dz = dO.join(baseL, Seq("ok")).select(col("o_custkey"),
        col("wa").as("w"), col("qty"))
      .unionByName(baseO.join(dL, Seq("ok")).select(col("o_custkey"),
        col("wb").as("w"), col("qty")))
      .unionByName(dO.join(dL, Seq("ok")).select(col("o_custkey"),
        (col("wa") * col("wb")).as("w"), col("qty")))
      .groupBy(col("o_custkey"))
      .agg(sum(col("w")).as("dcnt"), sum(col("w") * col("qty")).as("dsq"))

    view.join(dz, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L))).as("n_pairs"),
        (coalesce(col("sq"), lit(BigDecimal(0)).cast(DecimalType(22, 2))) +
          coalesce(col("dsq"), lit(BigDecimal(0)).cast(DecimalType(22, 2))))
          .as("sq_dec"))
      .filter(col("n_pairs") > 0)
      .select(col("o_custkey"), col("n_pairs"),
        col("sq_dec").cast(DoubleType).as("sum_qty"))
      .orderBy(col("o_custkey"))
  }

  /** Zone-map predicate bounds for [[zonemapAudit]] — shared with the
    * oracle SQL so op and oracle cannot drift. */
  private[graft] val ZoneDateLo  = 400L      // day-index window [lo, hi]
  private[graft] val ZoneDateHi  = 500L
  private[graft] val ZonePriceGt = 450000.0  // price > threshold probe

  /** Zone-map (min/max statistics) skip-ratio audit: how many of a
    * table's write batches can a predicate prune WITHOUT reading them?
    * Orders are grouped into monthly "files" (the natural append layout
    * of a time-series ingest), each file's min/max recorded for a
    * CLUSTERED column (order date — correlated with arrival) and an
    * UNCLUSTERED one (price — uniform within every month), then two
    * probe predicates are tested against the zones: a date window skips
    * every file whose range misses it; a price threshold skips a file
    * only if its max clears it.
    *
    * This is the measurement behind every lakehouse layout decision:
    * min/max stats prune ~95% of files for the clustered column and ~0%
    * for the unclustered one at ANY volume — the quantified argument for
    * re-clustering/z-ordering a 100 TB table
    * ([[graft.olap.Layout.writeZOrdered]] is the fix this audit
    * motivates; `q_compaction_plan` sizes the rewrite). Cost:
    * one O(files)-output aggregate plus two O(files) reductions — the
    * audit never reads more than the stats a writer already maintains.
    */
  def zonemapAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast(LongType).as("file_id"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
        .cast(LongType).as("day_idx"),
      col("o_totalprice").cast(DoubleType).as("price"))
    val zones = o.groupBy(col("file_id")).agg(
      count(lit(1)).as("n_rows"),
      min(col("day_idx")).as("d_min"), max(col("day_idx")).as("d_max"),
      min(col("price")).as("p_min"), max(col("price")).as("p_max"))
    def summarize(name: String, skip: Column): DataFrame =
      zones.agg(
        lit(name).as("predicate"),
        count(lit(1)).as("n_files"),
        count(when(skip, 1)).as("n_skipped"),
        coalesce(sum(when(skip, col("n_rows"))), lit(0L)).as("rows_skipped"))
        .withColumn("skip_ratio",
          col("n_skipped").cast(DoubleType) / col("n_files").cast(DoubleType))
    summarize("date_between",
        col("d_max") < ZoneDateLo || col("d_min") > ZoneDateHi)
      .unionByName(summarize("price_gt", col("p_max") <= ZonePriceGt))
      .orderBy(col("predicate"))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions.col

import graft.olap.Layout

/** SCALE.md "real cluster" #1 as plans, not prose: bucketed tables delete
  * the join shuffles; partitioned writes prune month-filtered scans at
  * planning time.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Exchanges in the PREPARED plan: `sparkPlan` predates
    * EnsureRequirements (no exchanges exist there yet), and with AQE the
    * executed plan hides them inside AdaptiveSparkPlanExec — so the test
    * runs with AQE off and reads `executedPlan`, where every Exchange the
    * query will pay is a visible node.
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketBy on the FK key deletes both join-side shuffles") {
    // broadcast off: models the 100 TB case where NEITHER side fits an
    // executor — the case bucketing exists for. (At sf0.001 Catalyst would
    // otherwise broadcast orders and trivially show zero join shuffles.)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Layout.writeBucketedPair(spark, sf, numBuckets = 8)
      val plain = Layout.orderRevenue(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      val bucketed = Layout.orderRevenue(
        spark.table("orders_bkt"), spark.table("lineitem_bkt"))

      // same query, same join strategy — only the layout differs
      assert(plain.queryExecution.sparkPlan
        .collect { case j: SortMergeJoinExec => j }.nonEmpty)
      assert(bucketed.queryExecution.sparkPlan
        .collect { case j: SortMergeJoinExec => j }.nonEmpty)
      // plain: 2 exchanges feeding the join + 1 for the groupBy
      assert(shuffles(plain) === 3)
      // bucketed: the join reads both sides pre-hashed — ONLY the groupBy
      // shuffle remains
      assert(shuffles(bucketed) === 1,
        "bucketed join still plans an Exchange on a bucketed side")
      // layout must never change the answer
      val p = plain.orderBy(col("o_custkey")).collect().toSeq
      val b = bucketed.orderBy(col("o_custkey")).collect().toSeq
      assert(b === p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("z-order clustering tightens per-file stats on BOTH dimensions") {
    import org.apache.spark.sql.functions._
    val n = 8 // files per layout
    // raw dims of very different widths (custkey ~8-bit, daykey ~12-bit):
    // writeZOrdered's internal full-range quantization is what keeps the
    // interleave balanced — the spec feeds it the unscaled columns
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("dkey"))
    val Array(minC, maxC, minD, maxD) = base
      .agg(min("o_custkey"), max("o_custkey"), min("dkey"), max("dkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray

    val zDir = Files.createTempDirectory("graft-zorder").toString
    val linDir = Files.createTempDirectory("graft-linear").toString
    Layout.writeZOrdered(base, "o_custkey", "dkey", zDir, n)
    // the single-dim alternative: range-sorted by dkey only
    base.repartitionByRange(n, col("dkey")).sortWithinPartitions(col("dkey"))
      .write.mode("overwrite").parquet(linDir)

    // per-file normalized coverage of each dim, from actual file contents
    // (what parquet row-group min/max stats will contain)
    def coverage(dir: String): Seq[(Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("o_custkey").as("a0"), max("o_custkey").as("a1"),
          min("dkey").as("b0"), max("dkey").as("b1"))
        .collect().toSeq.map { r =>
          ((r.getAs[Long]("a1") - r.getAs[Long]("a0")).toDouble / (maxC - minC).toDouble,
           (r.getAs[Long]("b1") - r.getAs[Long]("b0")).toDouble / (maxD - minD).toDouble)
        }
    val zCov = coverage(zDir)
    val linCov = coverage(linDir)
    assert(zCov.size === n && linCov.size === n)
    def avg(xs: Seq[Double]): Double = xs.sum / xs.size
    // the linear layout is perfect on its sort dim and useless on the
    // other: every file spans (nearly) the whole custkey domain
    assert(avg(linCov.map(_._1)) > 0.8, s"linear custkey coverage: $linCov")
    // z-order bounds the WORST dimension per file — a filter on EITHER dim
    // can skip most files from stats alone
    val zWorst = avg(zCov.map(c => math.max(c._1, c._2)))
    val linWorst = avg(linCov.map(c => math.max(c._1, c._2)))
    assert(zWorst < 0.7, s"z-order worst-dim coverage too wide: $zCov")
    assert(zWorst < linWorst * 0.8,
      s"z-order ($zWorst) should beat single-dim sort ($linWorst) on worst-dim stats")
    // clustering must not change the data
    assert(spark.read.parquet(zDir).count() === base.count())
    val keySum = base.agg(sum("o_orderkey")).collect().head.getLong(0)
    assert(spark.read.parquet(zDir).agg(sum("o_orderkey")).collect().head.getLong(0) === keySum)
  }

  test("writeZOrdered fails fast on empty input instead of a null-bounds NPE") {
    import org.apache.spark.sql.functions._
    val empty = Tables.orders(spark, sf)
      .filter(col("o_orderkey") < 0) // no rows -> NULL min/max aggregates
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("dkey"))
    val out = Files.createTempDirectory("graft-zempty").toString
    val ex = intercept[IllegalArgumentException] {
      Layout.writeZOrdered(empty, "o_custkey", "dkey", out, 2)
    }
    assert(ex.getMessage.contains("no min/max bounds"))
  }

  test("dynamic partition overwrite: a backfill rewrites only its own date") {
    // the idempotent-backfill contract at 100 TB: re-running one day's job
    // in overwrite mode must replace THAT day's partition and leave every
    // other day untouched (static overwrite mode would clobber the table)
    val out = Files.createTempDirectory("graft-backfill").toString
    Layout.writePartitionedEvents(spark, sf, out)
    val before = spark.read.parquet(out)
    val dates = before.select("event_date").distinct()
      .collect().map(_.get(0).toString).sorted
    assert(dates.length > 1)
    val target = dates.head
    val othersBefore = before.filter(col("event_date") =!= target).count()

    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the backfill: target day only, halved rows (a corrected re-run)
      Tables.events(spark, sf)
        .withColumn("event_date",
          org.apache.spark.sql.functions.date_format(col("ts"), "yyyy-MM-dd"))
        .filter(col("event_date") === target && col("event_id") % 2 === 0)
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    val after = spark.read.parquet(out)
    val expectedTarget = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.date_format(col("ts"), "yyyy-MM-dd") === target
        && col("event_id") % 2 === 0).count()
    assert(after.filter(col("event_date") === target).count() === expectedTarget)
    assert(after.filter(col("event_date") =!= target).count() === othersBefore,
      "untargeted partitions were clobbered by the backfill")
  }

  test("schema evolution: mergeSchema reads old and new file generations") {
    // a 100 TB table accretes columns over years; readers must union the
    // generations (old files surface the new column as NULL) instead of
    // requiring a petabyte rewrite
    val out = Files.createTempDirectory("graft-evolve").toString
    val v1 = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    v1.write.parquet(s"$out/gen=1")
    val v2 = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority")) // the accreted column
    v2.write.parquet(s"$out/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet ===
      Set("o_orderkey", "o_custkey", "o_orderpriority", "gen"))
    assert(merged.count() === 2 * v1.count())
    // old generation: accreted column is NULL; new generation: populated
    assert(merged.filter(col("gen") === 1 && col("o_orderpriority").isNotNull).count() === 0)
    assert(merged.filter(col("gen") === 2 && col("o_orderpriority").isNull).count() === 0)
  }

  test("partitionBy prunes a date-filtered scan to its partition") {
    val out = Files.createTempDirectory("graft-layout").toString
    Layout.writePartitionedEvents(spark, sf, out)
    val all = spark.read.parquet(out)
    // partition discovery infers the dir values back as DATE
    val dates = all.select("event_date").distinct()
      .collect().map(_.get(0).toString).sorted
    assert(dates.length > 1, "fixture must span several dates to prove pruning")

    val one = all.filter(col("event_date") === dates.head)
    val scan = one.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.partitionFilters.nonEmpty,
      "date filter did not reach the scan as a partition filter")
    // planning-time pruning: the selected partition directories shrink to
    // exactly the one date, before anything runs
    assert(scan.selectedPartitions.partitionCount === 1)
    val full = all.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(full.selectedPartitions.partitionCount === dates.length)

    // and the pruned scan still returns exactly that date's rows
    val expected = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.date_format(col("ts"), "yyyy-MM-dd") === dates.head)
      .count()
    assert(one.count() === expected)
  }
}

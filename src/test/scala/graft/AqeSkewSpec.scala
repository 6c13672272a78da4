package graft

import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE skew handling vs the manual salt (SCALE.md "real cluster" #3,
  * VERDICT r6 #8): where Spark's adaptive skew-join split covers a hot key
  * automatically, and where it provably does NOT — the boundary that
  * decides when the q_salted_join/q_salted_agg rewrites are required.
  *
  * The boundary, demonstrated on the same hot-key input below:
  *
  *  - JOIN skew: `OptimizeSkewedJoin` reads the join-input shuffle's
  *    map-output statistics at runtime and splits the hot reduce partition
  *    into PartialReducerPartitionSpec mapper-range slices, replicating
  *    matching build rows. The final adaptive plan marks the join
  *    `isSkewJoin` — asserted here, answer hash-identical to AQE off.
  *
  *  - HOLISTIC-aggregate skew: a decomposable aggregate (sum/count) is
  *    already skew-immune — partial aggregation collapses the hot key to
  *    one row per mapper BEFORE the shuffle. But a holistic aggregate
  *    (exact percentile, collect_list) ships its entire value buffer
  *    through the shuffle, so the hot key's full value set lands on ONE
  *    reducer — and AQE has NO rewrite for it: splitting a reduce
  *    partition under an aggregate would yield per-slice results without
  *    the extra merge level AQE never inserts. Asserted here: the hot
  *    partition measures skewed by the exact thresholds that split the
  *    join, yet no PartialReducerPartitionSpec appears. The manual
  *    escapes are the oracle-proven two-phase salt (decomposable aggs,
  *    `q_salted_agg`) or a mergeable sketch (`approx_percentile`,
  *    ApproxSpec) for holistic ones.
  *
  * Two fixture-vs-cluster notes, both discovered the hard way:
  *  - AQE's split granularity is MAPPER RANGES. The sf parquet fixtures
  *    are single-row-group files, so a scan yields ONE non-empty map task
  *    and nothing can split; `repartition(8)` upstream stands in for the
  *    thousands of mappers any real input has.
  *  - Detection reads COMPRESSED map-output bytes. 54 k copies of a
  *    constant join key lz4-compress to ~0.3 B/row, hiding row skew from
  *    byte stats; the md5 payload column (kept alive through the shuffle
  *    by the aggregate) makes bytes track rows the way real payloads do.
  */
class AqeSkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** lineitem with ~90% of rows rewritten to ONE hot join key, an
    * incompressible payload, and a multi-mapper upstream. */
  private def skewedFact = Tables.lineitem(spark, sf).select(
    when(col("l_orderkey") % 10 =!= 0, lit(1L)).otherwise(col("l_orderkey")).as("k"),
    col("l_quantity"),
    md5(concat(col("l_orderkey").cast("string"), lit("_"),
      col("l_linenumber").cast("string"))).as("payload"))
    .repartition(8)

  private def withConfs[A](confs: (String, String)*)(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Thresholds scaled to the fixture (hot partition ~1.9 MB vs ~60 KB
    * median) the way the defaults (256 MB) relate to real executor budgets. */
  private val SkewFactor = 2.0
  private val SkewThresholdBytes = 16 * 1024L
  private val aqeSkewConfs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> SkewFactor.toString,
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> SkewThresholdBytes.toString,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Every node of the EXECUTED adaptive plan: `collect` alone stops at
    * query-stage boundaries (QueryStageExec is a leaf wrapping its stage's
    * materialized plan), so recurse through stages and nested adaptive
    * plans explicitly. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case other                    => other.children.flatMap(flatten)
    })

  private def finalNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] =
    flatten(df.queryExecution.executedPlan)

  test("AQE splits a skewed sort-merge JOIN at runtime (isSkewJoin in final plan)") {
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    def run(): (Seq[org.apache.spark.sql.Row], org.apache.spark.sql.DataFrame) = {
      // max(payload) keeps the payload column alive through the join-input
      // shuffle (column pruning would otherwise strip it and re-hide the
      // byte skew the detection needs)
      val df = skewedFact.join(dim, Seq("k"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), max(col("payload")).as("max_payload"))
        .orderBy(col("o_orderpriority"))
      (df.collect().toSeq, df)
    }
    val (skewRows, skewDf) = withConfs(aqeSkewConfs: _*)(run())
    val smjs = finalNodes(skewDf).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, "expected a sort-merge join under AQE with broadcast off")
    assert(smjs.exists(_.isSkewJoin),
      "AQE did not mark the hot-key join as skew-split")
    // and the split materially happened: the join's shuffle read carries
    // mapper-range slices of the hot partition
    val splits = finalNodes(skewDf).collect { case r: AQEShuffleReadExec => r }
      .flatMap(_.partitionSpecs).collect { case p: PartialReducerPartitionSpec => p }
    assert(splits.size > 1, "skew join without partial-reducer slices")
    // the split replicates build rows across slices; the answer must be
    // exactly the non-adaptive plan's
    val (plainRows, _) = withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(run())
    assert(skewRows === plainRows)
  }

  test("AQE does NOT split a skewed HOLISTIC aggregate — the salt/sketch-only case") {
    val agg = withConfs(aqeSkewConfs: _*) {
      // exact percentile is holistic: the partial buffer carries every
      // value, so the hot key's 54 k values all shuffle to one reducer.
      // The value is md5-derived (full entropy): a buffer of l_quantity's
      // ~50 distinct small doubles would compress back under the byte
      // thresholds and hide the row skew this test is about.
      val df = skewedFact
        .withColumn("v", conv(substring(col("payload"), 1, 8), 16, 10).cast("double"))
        .groupBy(col("k"))
        .agg(percentile(col("v"), lit(0.5)).as("p50"))
      df.collect()
      df
    }
    // the aggregate-input shuffle IS skewed by the exact thresholds that
    // split the join above...
    val stages = finalNodes(agg).collect { case s: ShuffleQueryStageExec => s }
    val skewedStage = stages.flatMap(_.mapStats).find { st =>
      val sizes = st.bytesByPartitionId.sorted
      val median = sizes(sizes.length / 2).max(1L)
      sizes.last > (median * SkewFactor).toLong.max(SkewThresholdBytes)
    }
    assert(skewedStage.isDefined,
      "fixture no longer produces a byte-skewed aggregate input; thresholds need retuning")
    // ...yet AQE leaves it whole: no partial-reducer slice anywhere
    val splits = finalNodes(agg).collect { case r: AQEShuffleReadExec => r }
      .flatMap(_.partitionSpecs).collect { case p: PartialReducerPartitionSpec => p }
    assert(splits.isEmpty,
      "AQE now skew-splits aggregates — revisit SCALE.md's salting rationale")
  }
}

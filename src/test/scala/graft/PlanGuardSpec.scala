package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.{And, Expression, IsNotNull, LambdaFunction}
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions.col

/** The SCALE.md plan audit as a regression test: every `SparkEntry.queries`
  * plan is inspected (pre-AQE physical plan — planning only, nothing runs,
  * except q_dedup_cc whose construction executes its bounded label-
  * propagation rounds eagerly; its guarded plan is the checkpointed result)
  * and the 100 TB invariants asserted, so a future edit that silently
  * degrades a plan fails the suite instead of the next bench round.
  */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val dfs: Map[String, org.apache.spark.sql.DataFrame] =
    SparkEntry.queries.map { case (name, fn) => name -> fn(spark, sf) }

  private lazy val plans: Map[String, SparkPlan] =
    dfs.map { case (name, df) => name -> df.queryExecution.sparkPlan }

  /** Tables that scale with the data — a raw (unreduced) broadcast of any
    * of these is an OOM at 100 TB. */
  private val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings")

  /** The CONSTRUCTIVE BNLJ sanction (VERDICT r8 #6 — replaces the
    * per-entry name list, which had grown to 22 sites): a nested-loop
    * join is acceptable at 100 TB only when its broadcast build side is
    * bounded by construction — it contains an AGGREGATE (reduced to
    * group-domain scale: the 1-row min/max/total crosses, the
    * bucket-total triangular probes), or a SELECTIVE filter (the
    * brute-force top-k probe sets), or touches no fact-scale table at
    * all (theta-contains' reference dims, seed LocalRelations). Every
    * historical sanctioned site satisfies this structurally, and any new
    * 1-row cross is sanctioned by construction instead of by editing a
    * list; a raw unreduced fact build side still fails. */
  private def boundedBuildSide(p: SparkPlan): Boolean = {
    val hasAgg = p.collectFirst { case a: BaseAggregateExec => a }.nonEmpty
    val hasSelectiveFilter =
      p.collectFirst { case f: FilterExec if isSelective(f.condition) => f }.nonEmpty
    val scansFact = p.collect { case s: FileSourceScanExec => s }.exists(s =>
      factTables.exists(t =>
        s.relation.location.rootPaths.exists(_.toString.contains(s"/$t.parquet"))))
    hasAgg || hasSelectiveFilter || !scansFact
  }

  test("every BroadcastNestedLoopJoin build side is bounded by construction") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    for ((name, plan) <- plans) {
      for (j <- plan.collect { case j: BroadcastNestedLoopJoinExec => j }) {
        val build = j.buildSide match {
          case BuildLeft  => j.left
          case BuildRight => j.right
        }
        assert(boundedBuildSide(build),
          s"$name plans a BNLJ whose build side is neither aggregate-reduced, " +
            s"selectively filtered, nor dim-only:\n$build")
      }
    }
    // canary: the invariant is exercised, not vacuous
    assert(plans("q_theta_contains")
      .collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty)
  }

  test("no raw array/map/struct column in any registry output schema") {
    // The driver's correctness gate lexsorts result rows in pandas before
    // hashing; a raw ArrayType column crashes that sort (round 8's
    // q_media_features: "unhashable type: numpy.ndarray"). Nested results
    // must be serialized — array_join/to_json, the collectTypes discipline.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    for ((name, df) <- dfs; f <- df.schema.fields) {
      val nested = f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
      assert(!nested,
        s"$name emits ${f.name}: ${f.dataType.simpleString} — the driver's " +
          "row-sorted compare cannot hash it; serialize it (array_join)")
    }
  }

  test("no CartesianProduct in any query plan") {
    for ((name, plan) <- plans) {
      val cart = plan.collect { case j: CartesianProductExec => j }
      assert(cart.isEmpty, s"$name plans a CartesianProduct")
    }
  }

  test("no unpartitioned window in any query plan") {
    for ((name, plan) <- plans) {
      val global = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(global.isEmpty, s"$name plans a single-partition (global) window sort")
    }
  }

  /** A predicate counts as SELECTIVE only if some conjunct is more than an
    * IsNotNull: planner-inserted null guards on join keys filter almost
    * nothing, so a raw fact broadcast behind one must still fail the
    * invariant (ADVICE r4). */
  private def isSelective(e: Expression): Boolean = e match {
    case And(l, r)    => isSelective(l) || isSelective(r)
    case _: IsNotNull => false
    case _            => true
  }

  test("fact-scale tables are never broadcast without a reducing step") {
    for ((name, plan) <- plans) {
      val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
      for (b <- broadcasts) {
        val scansFact = b.collect { case s: FileSourceScanExec => s }.exists(s =>
          factTables.exists(t =>
            s.relation.location.rootPaths.exists(_.toString.contains(s"/$t.parquet"))))
        val reduced = b.collect {
          case a: BaseAggregateExec => a: SparkPlan
          case f: FilterExec if isSelective(f.condition) => f: SparkPlan
        }.nonEmpty
        assert(!scansFact || reduced,
          s"$name broadcasts a fact-scale table with no filter/aggregate below the exchange")
      }
    }
  }

  test("no higher-order lambda inside any Filter condition") {
    // Predicate pushdown substitutes projected expressions into filters
    // with NO duplication guard (unlike CollapseProject): a lambda that
    // references a projected array re-derives that array PER ELEMENT once
    // inlined — the O(tokens²) blowup q_curation_pipeline hit (6.6 s vs
    // 0.9 s at sf0.1) when its gate filter swallowed the bigram transform.
    // Expensive array work must sit behind an aggregate/generate barrier;
    // this pins that no future entry reintroduces the shape.
    for ((name, plan) <- plans) {
      val offenders = plan.collect {
        case f: FilterExec
            if f.condition.collectFirst { case l: LambdaFunction => l }.nonEmpty => f
      }
      assert(offenders.isEmpty,
        s"$name evaluates a higher-order lambda inside a Filter: ${offenders.headOption}")
    }
  }

  test("the two-phase multi-distinct rewrite plans no Expand") {
    // the point of the escape hatch: 4 exact COUNT(DISTINCT)s without the
    // 4x pre-shuffle row replication (VERDICT r4 next-round #6)
    assert(plans("q_multi_count_distinct")
      .collect { case e: ExpandExec => e }.nonEmpty,
      "baseline q_multi_count_distinct should show the Expand being escaped")
    assert(plans("q_multi_count_distinct_twophase")
      .collect { case e: ExpandExec => e }.isEmpty,
      "q_multi_count_distinct_twophase plans an Expand — the rewrite regressed")
  }

  test("the CC propagation round plans hash join + combining aggregate only") {
    // q_dedup_cc's loop executes eagerly, so the whole-query guards above
    // only ever see its checkpointed stub — audit the per-round plan the
    // loop actually pays, LAZILY, via the factored-out round builder
    val edges = graft.queries.TextOps.ccEdges(spark, sf)
    val labels = edges.select(col("src").as("doc_id"))
      .distinct().withColumn("comp", col("doc_id"))
    val round = graft.queries.TextOps
      .ccRound(labels, edges).queryExecution.sparkPlan
    assert(round.collect { case j: CartesianProductExec => j }.isEmpty)
    assert(round.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(round.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.isEmpty)
    // the neighbor-min aggregate must combine map-side (partial_min)
    assert(round.collect { case a: BaseAggregateExec => a }
      .exists(_.aggregateExpressions.exists(_.toString.contains("partial_min"))),
      "CC round's neighbor-min aggregate lost its map-side partial")
  }

  test("LM/DSIR pay the bigram explode twice (train + score), never per model") {
    // ADVICE r7: dsirWeights' docstring claimed one exploded pass while
    // the plan ran it per consumer (3x). The conditional-aggregate
    // restructure bounds it at two document scans — one LM-train pass,
    // one re-score pass — independent of how many models are trained.
    for (name <- Seq("q_lm_score", "q_dsir")) {
      val scans = plans(name).collect { case s: FileSourceScanExec => s }
      assert(scans.size === 2,
        s"$name plans ${scans.size} file scans; the tokenize+explode pass " +
          "must run exactly twice (train + score)")
    }
  }

  test("EP1 staging (the 100 TB front door) plans no window at all") {
    val dir = Files.createTempDirectory("graft-planguard")
    val stg = graft.etl.Ingest.stageObservations(spark, graft.etl.DopiFixture.write(dir))
    assert(stg.queryExecution.sparkPlan.collect { case w: WindowExec => w }.isEmpty)
  }
}

package graft

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BinaryComparison, Expression, In, Literal}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The `.explain("formatted")` review mechanized (round-9 backlog #3):
  * anti-patterns BEYOND PlanGuardSpec's structural set, the ones a human
  * plan reading catches — a shuffle join fed by a provably tiny side, a
  * selective predicate that failed to reach the parquet scan. PlanGuard
  * guards against catastrophes (cartesians, fact broadcasts, unpartitioned
  * windows); this sweep guards EFFICIENCY choices that silently rot.
  */
class ExplainSweepSpec extends SparkSpec {

  // one default-conf corpus shared with PlanGuardSpec (see PlanCorpus)
  private lazy val plans: Map[String, SparkPlan] = PlanCorpus.plans

  /** Tables whose size is CONSTANT regardless of data scale — a shuffle
    * join against one of these is never the right plan at 100 TB. */
  private val constantTables = Seq("region", "nation")

  /** Peels cardinality-preserving wrappers (project/filter/sort/exchange)
    * so a join side can be tested for what it IS, not what it contains —
    * a 1-row aggregate consumed by a broadcast join deep inside a side is
    * fine; a 1-row aggregate that IS the side is the defect. */
  @annotation.tailrec
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case w: org.apache.spark.sql.execution.ProjectExec => unwrap(w.child)
    case w: org.apache.spark.sql.execution.FilterExec => unwrap(w.child)
    case w: org.apache.spark.sql.execution.SortExec => unwrap(w.child)
    case w: org.apache.spark.sql.execution.exchange.Exchange => unwrap(w.child)
    case other => other
  }

  test("no sort-merge join consumes a 1-row (grouping-less) aggregate side") {
    for ((name, plan) <- plans; j <- plan.collect { case s: SortMergeJoinExec => s };
         side <- Seq(j.left, j.right)) {
      // a grouping-less aggregate is exactly one row by construction; if a
      // join SEES IT as a shuffle side (through nothing but
      // cardinality-preserving wrappers), the planner's size estimate lost
      // the reduction — broadcast it explicitly instead
      val oneRow = unwrap(side) match {
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
        case _ => false
      }
      assert(!oneRow,
        s"$name sort-merge-joins a side reduced to ONE ROW by a grouping-less " +
          s"aggregate — broadcast() it:\n$side")
    }
  }

  test("no sort-merge join against a constant-size dim (region/nation)") {
    for ((name, plan) <- plans; j <- plan.collect { case s: SortMergeJoinExec => s };
         side <- Seq(j.left, j.right)) {
      val scans = side.collect { case s: FileSourceScanExec => s }
      val constOnly = scans.nonEmpty && scans.forall(s =>
        constantTables.exists(t =>
          s.relation.location.rootPaths.exists(_.toString.contains(s"/$t.parquet"))))
      assert(!constOnly,
        s"$name shuffle-joins a side that scans only constant-size dims " +
          s"(${constantTables.mkString("/")}) — broadcast() it:\n$side")
    }
  }

  /** A predicate the parquet source CAN push: a plain comparison or IN
    * between a top-level column and literals. Expression-wrapped columns
    * (md5(col), size(col)...) are legitimately unpushable and excluded. */
  private def pushable(e: Expression): Boolean = e match {
    case b: BinaryComparison => (b.left, b.right) match {
      case (_: Attribute, _: Literal) | (_: Literal, _: Attribute) => true
      case _ => false
    }
    case In(_: Attribute, vs) => vs.forall(_.isInstanceOf[Literal])
    case _ => false
  }

  test("pushable scan-level predicates actually reach the parquet scan") {
    for ((name, plan) <- plans; s <- plan.collect { case s: FileSourceScanExec => s }) {
      val want = s.dataFilters.filter(pushable)
      if (want.nonEmpty) {
        val pushed = s.metadata.getOrElse("PushedFilters", "[]")
        assert(pushed != "[]",
          s"$name scans ${s.relation.location.rootPaths.headOption.getOrElse("?")} " +
            s"with pushable data filters ${want.mkString(", ")} " +
            "but PushedFilters is EMPTY — the scan reads rows the filter discards")
      }
    }
    // canary: the invariant is exercised — at least one plan pushes a filter
    assert(plans.exists { case (_, p) =>
      p.collect { case s: FileSourceScanExec => s }
        .exists(_.metadata.getOrElse("PushedFilters", "[]") != "[]") })
  }
}

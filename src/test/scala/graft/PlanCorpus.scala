package graft

import org.apache.spark.sql.execution.SparkPlan

/** ONE default-conf plan corpus shared by [[PlanGuardSpec]] and
  * [[ExplainSweepSpec]] (suite wall-clock, VERDICT r15 #1): each spec used
  * to build its own `SparkEntry.queries → sparkPlan` map, and building one
  * is expensive — Catalyst plans 283 queries and the iterative entries
  * (graph loops, dedup_cc, q-digest) EXECUTE eagerly at construction — so
  * two private corpora cost the suite two full sweeps (~180 s each).
  *
  * Construction is parallel over the registry: planning is driver-side and
  * thread-safe, and the eagerly-executing entries serialize on
  * [[graft.queries.GraphOps.releasingCaches]]'s lock (its RDD-pin sweep is
  * only correct one-entry-at-a-time; the lock moved that invariant from
  * "callers happen to be sequential" into the method itself).
  *
  * NOT shared with [[PlanShapeSpec]]: its digest fixture is pinned under
  * `autoBroadcastJoinThreshold = -1` (the 100 TB model), a different
  * planner configuration by design.
  */
private[graft] object PlanCorpus {
  val sf = "/root/testdata/sf0.001"

  lazy val dfs: Map[String, org.apache.spark.sql.DataFrame] = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = SparkEntry.queries.toSeq.map { case (name, fn) =>
        Future(name -> fn(SparkSpec.session, sf))
      }
      Await.result(Future.sequence(futs), Duration.Inf).toMap
    } finally pool.shutdown()
  }

  lazy val plans: Map[String, SparkPlan] =
    dfs.map { case (name, df) => name -> df.queryExecution.sparkPlan }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.Tables
import graft.queries.BehaviorOps.EwmaAlpha

/** The unbounded-history escape hatch [[graft.queries.BehaviorOps.ewma]]
  * documents: the per-user EWMA fold carried as `mapGroupsWithState`
  * state — one (count, ewma) record per user, folded forward forever —
  * instead of re-collecting and re-sorting each user's full history per
  * run. `mapGroupsWithState` is the right stateful verb here where
  * sessionization needed `flatMapGroups...`: every key emits EXACTLY ONE
  * row per invocation (its updated running average), never a
  * data-dependent number of sessions.
  *
  * The batch entry (`q_ewma_state`) runs the SAME state-transition
  * function through the batch-mode `mapGroupsWithState` (state starts
  * empty, each key's iterator is its whole history) and shares q_ewma's
  * oracle — one oracle, three plans (HOF fold, stateful fold, streaming
  * fold). The incremental form is exercised in StreamingSpec: feeding
  * the same events through a MemoryStream in several time-ordered
  * micro-batches must land every user on the BIT-IDENTICAL final state,
  * because the fold composes — fold(fold(s, a), b) = fold(s, a ++ b) —
  * and α, 1−α, and every intermediate are IEEE doubles under
  * correctly-rounded ×/+.
  *
  * Scale notes: state is O(users) × 16 bytes, hash-partitioned by
  * user_id; per-trigger work buffers ONE user's batch slice (bounded by
  * per-entity arrival rate, the Sessionize trade). The batch-mode twin
  * still pays the per-user sort — but inside the state function, with
  * no collect_list array materialized in a row.
  */
object EwmaState {

  case class Ev(user_id: Long, ts: Long, event_id: Long, value: Double)
  case class St(n: Long, ewma: Double)
  case class Out(user_id: Long, n: Long, ewma: Double)

  /** Pure fold of time-sorted values into the running state — seeded by
    * the first value ever seen (matching the batch HOF's first-element
    * seed), then s ← α·x + (1−α)·s. Factored so the cross-batch
    * composition law is property-testable without streaming machinery. */
  def fold(st: Option[St], sorted: Seq[Double]): Option[St] =
    sorted.foldLeft(st) {
      case (None, v)            => Some(St(1L, v))
      case (Some(St(n, e)), v)  =>
        Some(St(n + 1, EwmaAlpha * v + (1.0 - EwmaAlpha) * e))
    }

  /** Per-user state transition: fold this batch's slice (sorted by
    * (ts, event_id) — the repo-wide total order) onto the carried state
    * and emit the updated running average. Shared verbatim by the batch
    * entry and the streaming query. */
  def step(uid: Long, it: Iterator[Ev], state: GroupState[St]): Out = {
    val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id)).map(_.value)
    val st = fold(state.getOption, sorted).get
    state.update(st)
    Out(uid, st.n, st.ewma)
  }

  /** The stateful plan over any typed event source — batch Dataset or
    * stream alike (`mapGroupsWithState` plans both). */
  def ewmaOf(events: Dataset[Ev]): Dataset[Out] = {
    implicit val stEnc  = Encoders.product[St]
    implicit val outEnc = Encoders.product[Out]
    implicit val kEnc   = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState[St, Out](GroupStateTimeout.NoTimeout)(step _)
  }

  /** `q_ewma_state`: the batch-mode stateful twin of q_ewma. */
  def ewmaStateBatch(spark: SparkSession, dir: String): DataFrame = {
    implicit val evEnc = Encoders.product[Ev]
    val ds = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Ev]
    ewmaOf(ds).toDF().orderBy(col("user_id"))
  }
}

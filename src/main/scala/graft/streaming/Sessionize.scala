package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap sessionization over the event stream: consecutive events of
  * a user belong to one session while the gap between them stays under
  * [[Sessionize.GapMs]]; a longer silence closes the session. This is the
  * canonical `flatMapGroupsWithState` use — per-key mutable state the
  * built-in window operators can't express (session length is data-driven,
  * not a fixed tumbling width).
  *
  * Scale notes: state is one tiny [[Sessionize.Open]] record per ACTIVE user,
  * hash-partitioned by user_id across executors; the event-time timeout
  * (watermark-driven) evicts idle users, so state size is O(concurrently
  * active users), never O(history).
  */
object Sessionize {

  /** Session gap: 30 minutes of silence closes a session. */
  val GapMs: Long = 30L * 60 * 1000

  case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  case class Open(startMs: Long, lastMs: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  /** Pure per-user fold of time-SORTED event millis into the open session:
    * returns the sessions closed by observed gaps (in time order) and the
    * still-open tail session. Extracted from the state transition so session
    * semantics are property-testable without streaming machinery — the key
    * invariant being that threading the fold across arbitrary micro-batch
    * splits equals folding all events at once.
    */
  def fold(open0: Option[Open], sortedMs: Seq[Long]): (List[Open], Option[Open]) = {
    // interval merge over (prior open session ∪ new events), in time
    // order: a cross-batch late event within GapMs of the open session
    // extends it BACKWARDS (min-clamped start), while a late event more
    // than GapMs before session_start is gap-separated — it must become
    // its own (immediately closed) session, NOT be folded into the open
    // one (an unconditional merge would emit a session violating its own
    // gap bound and diverge from the batch analog). Only the LAST run can
    // still grow, so every earlier run closes.
    val items = (open0.toList ++ sortedMs.map(t => Open(t, t, 1)))
      .sortBy(s => (s.startMs, s.lastMs))
    var closed = List.empty[Open]
    var cur: Option[Open] = None
    for (it <- items) {
      cur = cur match {
        case Some(s) if it.startMs - s.lastMs <= GapMs =>
          Some(Open(math.min(s.startMs, it.startMs),
            math.max(s.lastMs, it.lastMs), s.n + it.n))
        case Some(s) =>
          closed ::= s
          Some(it)
        case None =>
          Some(it)
      }
    }
    (closed.reverse, cur)
  }

  /** Per-user state transition for one micro-batch: fold the new events
    * into the open session, emitting every session a gap closes; on
    * event-time timeout (watermark passed last_event + gap) emit the final
    * open session and clear state.
    */
  def step(userId: Long, events: Iterator[Ev],
           state: GroupState[Open]): Iterator[Session] = {
    def close(s: Open) =
      Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).iterator
      state.remove()
      out
    } else {
      // buffers ONE user's events from ONE micro-batch (not history): bounded
      // by per-user per-trigger arrival rate. A user hot enough to blow this
      // buffer needs key salting upstream (SCALE.md, Streaming) — state
      // itself stays one Open record regardless.
      val (closed, open) =
        fold(state.getOption, events.toSeq.map(_.ts.getTime).sorted)
      open.foreach { s =>
        state.update(s)
        // fires once the watermark passes the point where no on-time event
        // can extend this session any more. Clamped above the current
        // watermark: flatMapGroupsWithState does NOT drop late rows, and a
        // timeout at-or-below the watermark is rejected by GroupState,
        // which would kill the query on a sufficiently late event.
        state.setTimeoutTimestamp(
          math.max(s.lastMs + GapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.iterator.map(close)
    }
  }

  /** events (watermarked upstream) → closed sessions, append-mode. */
  def sessions(events: Dataset[Ev]): Dataset[Session] = {
    implicit val openEnc = Encoders.product[Open]
    implicit val sessEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}

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

  /** Per-user state transition for one micro-batch: fold the (sorted) new
    * events into the open session, emitting every session a gap closes; on
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
      var closed = List.empty[Session]
      var open = state.getOption
      for (e <- events.toSeq.sortBy(_.ts.getTime)) {
        val t = e.ts.getTime
        open = open match {
          case Some(s) if t - s.lastMs <= GapMs =>
            Some(Open(s.startMs, math.max(s.lastMs, t), s.n + 1))
          case Some(s) =>
            closed ::= close(s)
            Some(Open(t, t, 1))
          case None =>
            Some(Open(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // fires once the watermark passes the point where no on-time event
        // can extend this session any more
        state.setTimeoutTimestamp(s.lastMs + GapMs)
      }
      closed.reverseIterator
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

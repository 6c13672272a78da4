package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

import Sessionize.{fold, GapMs, Open}

/** ScalaCheck invariants of the pure sessionization fold — no Spark needed:
  *  1. event conservation: every event lands in exactly one session;
  *  2. session shape: start <= end, consecutive sessions separated by more
  *     than the gap, internal span bounded by (n-1)*gap;
  *  3. micro-batch invariance: threading the fold across ANY split of the
  *     (sorted) event sequence yields the same sessions as one fold — the
  *     property that makes the streaming operator trigger-schedule-proof.
  */
object SessionizeProps extends Properties("Sessionize") {

  private val genTimes: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 100L * GapMs)).map(_.sorted)

  private def allSessions(ts: List[Long]): List[Open] = {
    val (closed, open) = fold(None, ts)
    closed ++ open.toList
  }

  property("every event lands in exactly one session") = Prop.forAll(genTimes) { ts =>
    allSessions(ts).map(_.n).sum == ts.size
  }

  property("sessions are ordered, gap-separated, and internally bounded") =
    Prop.forAll(genTimes) { ts =>
      val ss = allSessions(ts)
      val shapes = ss.forall(s => s.startMs <= s.lastMs &&
        s.lastMs - s.startMs <= (s.n - 1).toLong * GapMs)
      val gaps = ss.zip(ss.drop(1)).forall { case (a, b) =>
        b.startMs - a.lastMs > GapMs
      }
      shapes && gaps
    }

  property("cross-batch late event extends the open session backwards") =
    Prop.forAll(Gen.choose(1L, GapMs), Gen.choose(0L, GapMs), Gen.choose(1, 5)) {
      (lateBy, span, n) =>
        // an open session [t0, t0+span] receives an event older than t0:
        // the gap test (t - lastMs <= gap) holds trivially for t < lastMs,
        // and the merge must LOWER session_start to the late event
        val t0 = 10L * GapMs
        val open0 = Open(t0, t0 + span, n)
        val (closed, open) = fold(Some(open0), Seq(t0 - lateBy))
        closed.isEmpty && open.contains(Open(t0 - lateBy, t0 + span, n + 1))
    }

  property("a beyond-gap straggler closes as its OWN session, never merged") =
    Prop.forAll(Gen.choose(1L, 10L * GapMs), Gen.choose(0L, GapMs), Gen.choose(1, 5)) {
      (beyondBy, span, n) =>
        // an event more than GapMs before session_start is gap-separated:
        // folding it into the open session would emit a session violating
        // its own gap bound (and diverge from the batch analog)
        val t0 = 20L * GapMs
        val open0 = Open(t0, t0 + span, n)
        val t = t0 - GapMs - beyondBy
        val (closed, open) = fold(Some(open0), Seq(t))
        closed == List(Open(t, t, 1)) && open.contains(open0)
    }

  property("fold is invariant to micro-batch splits") =
    Prop.forAll(genTimes, Gen.choose(0, 5)) { (ts, nSplits) =>
      val splitAt = (1 to nSplits).map(i => ts.size * i / (nSplits + 1))
      val chunks = (Seq(0) ++ splitAt ++ Seq(ts.size)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => ts.slice(a, b) }.toList
      val (closedInc, openInc) = chunks.foldLeft((List.empty[Open], Option.empty[Open])) {
        case ((done, open), chunk) =>
          val (closed, next) = fold(open, chunk)
          (done ++ closed, next)
      }
      (closedInc ++ openInc.toList) == allSessions(ts)
    }
}

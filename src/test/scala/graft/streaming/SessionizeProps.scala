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

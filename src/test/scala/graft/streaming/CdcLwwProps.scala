package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** Pure reference model of the CDC LWW register ([[Streams.cdcMergeState]])
  * — the executable specification the Spark plan is equivalence-tested
  * against in StreamingSpec. One row per key; an incoming change wins only
  * a STRICT (ts, event_id) comparison; tombstones are retained.
  */
object CdcModel {
  case class Ev(key: Long, eid: Long, ts: Long, op: String, value: Double)
  case class Reg(name: Option[String], value: Option[Double], inSnap: Boolean,
                 changed: Boolean, deleted: Boolean, stamp: Option[(Long, Long)])

  def init(snap: Map[Long, (String, Double)]): Map[Long, Reg] =
    snap.map { case (k, (n, v)) =>
      k -> Reg(Some(n), Some(v), inSnap = true, changed = false,
        deleted = false, stamp = None)
    }

  def merge(state: Map[Long, Reg], batch: Seq[Ev]): Map[Long, Reg] = {
    val latest = batch.groupBy(_.key).map { case (k, evs) =>
      k -> evs.maxBy(e => (e.ts, e.eid))
    }
    latest.foldLeft(state) { case (st, (k, e)) =>
      val cur = st.get(k)
      val newer = Ordering[(Long, Long)]
      val win = cur.forall(r => r.stamp.forall(s => newer.gt((e.ts, e.eid), s)))
      if (!win) st
      else {
        val base = cur.getOrElse(
          Reg(None, None, inSnap = false, changed = false, deleted = false, None))
        st.updated(k, base.copy(value = Some(e.value), changed = true,
          deleted = e.op == "error", stamp = Some((e.ts, e.eid))))
      }
    }
  }

  /** The published view: tombstones drop, actions classify as the one-shot
    * MERGE does. */
  def release(state: Map[Long, Reg]): Map[Long, (Option[String], Option[Double], String)] =
    state.filterNot(_._2.deleted).map { case (k, r) =>
      k -> ((r.name, r.value,
        if (!r.changed) "unchanged" else if (!r.inSnap) "insert" else "update"))
    }
}

/** ScalaCheck invariants of the LWW register — the convergence claims the
  * streaming CDC sink rests on, checked over hundreds of random change
  * logs, batch partitions, and arrival orders (deliberately including
  * same-ts ties, which only the event_id tiebreak resolves):
  *  1. batch-schedule invariance: ANY partition of the log into batches,
  *     merged in ANY order, releases the same table as one merge of the
  *     whole log — micro-batch boundaries and out-of-order arrival are
  *     semantically invisible;
  *  2. redelivery idempotence: re-merging any already-applied batch is a
  *     no-op (foreachBatch is at-least-once);
  *  3. tombstone correctness: a key is absent from the release iff its
  *     globally-latest change is the tombstone op.
  */
object CdcLwwProps extends Properties("CdcLww") {
  import CdcModel._

  private val genSnap: Gen[Map[Long, (String, Double)]] =
    Gen.someOf(3L to 12L).map(_.map(k => k -> ((s"n$k", k * 10.0))).toMap)

  // keys 0..15 overlap the snapshot partially; ts 0..5 forces ties so the
  // event_id tiebreak is exercised; eids unique by construction
  private val genLog: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 40)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 15L)
      ts <- Gen.choose(0L, 5L)
      op <- Gen.frequency(4 -> Gen.const("set"), 1 -> Gen.const("error"))
      v <- Gen.choose(0, 1000).map(_ / 10.0)
    } yield (k, ts, op, v))
  } yield evs.zipWithIndex.map { case ((k, ts, op, v), i) => Ev(k, i.toLong, ts, op, v) }

  /** Random partition of the log into 1..4 batches, randomly ordered. */
  private def genSchedule(log: List[Ev]): Gen[List[List[Ev]]] = for {
    nb <- Gen.choose(1, 4)
    assignment <- Gen.listOfN(log.size, Gen.choose(0, nb - 1))
    // a generated permutation (not Random.shuffle: that would escape the
    // ScalaCheck seed and make failures unreproducible)
    weights <- Gen.listOfN(nb, Gen.choose(0, 1000))
    order = (0 until nb).sortBy(i => (weights(i), i)).toList
  } yield {
    val batches = log.zip(assignment).groupMap(_._2)(_._1)
    order.map(b => batches.getOrElse(b, Nil))
  }

  private val genCase: Gen[(Map[Long, (String, Double)], List[Ev], List[List[Ev]])] =
    for {
      snap <- genSnap
      log <- genLog
      sched <- genSchedule(log)
    } yield (snap, log, sched)

  property("any batch schedule releases the one-shot answer") =
    Prop.forAll(genCase) { case (snap, log, sched) =>
      val oneShot = release(merge(init(snap), log))
      val batched = release(sched.foldLeft(init(snap))(merge))
      batched == oneShot
    }

  property("re-merging an already-applied batch is a no-op") =
    Prop.forAll(genCase) { case (snap, _, sched) =>
      val after = sched.foldLeft(init(snap))(merge)
      sched.forall(b => release(merge(after, b)) == release(after))
    }

  property("released iff the globally-latest change is not the tombstone") =
    Prop.forAll(genCase) { case (snap, log, _) =>
      val rel = release(merge(init(snap), log))
      val keys = snap.keySet ++ log.map(_.key)
      keys.forall { k =>
        val latest = log.filter(_.key == k)
          .sortBy(e => (e.ts, e.eid)).lastOption
        val expectPresent = latest match {
          case Some(e) => e.op != "error"
          case None => snap.contains(k)
        }
        rel.contains(k) == expectPresent
      }
    }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType}

import graft.Tables
import graft.queries.BehaviorOps.{SprtBoundArg, SprtP0, SprtP1}
import graft.queries.StatsOps.LogScale

/** [[graft.queries.BehaviorOps.sprtMonitor]]'s running LLR carried as
  * `flatMapGroupsWithState` state — the sequential test is literally a
  * fold (the cumsum of integer LLR increments per arm), so the streaming
  * monitor keeps ONE long per arm and emits a decision row per incoming
  * day bin, instead of re-windowing the whole history per run. Where
  * [[EwmaState]] used `mapGroupsWithState` (one row per key per
  * invocation), the monitor emits one row PER DAY BIN — a data-dependent
  * count — which is exactly the `flatMapGroups...` case.
  *
  * The input is the (arm, day, n, x) day-binned feed (upstream, the
  * one-aggregation windowed count any append-mode stream can produce);
  * the batch entry `q_sprt_state` builds the same bins with a plain
  * groupBy, runs the SAME state-transition function through batch-mode
  * `flatMapGroupsWithState`, and shares q_sprt_monitor's oracle — one
  * oracle, two plans (window cumsum, stateful fold). Incremental
  * composition is exact BY CONSTRUCTION — the state is an integer sum,
  * so batch splits compose with no float law needed (the spec feeds
  * day-ordered micro-batches and asserts bit-identical rows).
  *
  * Scale notes: state is O(arms) × 8 bytes; per-trigger work is the
  * batch's bin slice per arm (calendar-scale). The day bins must arrive
  * day-ordered per arm across triggers (the monitor's contract — a
  * backfilled day would need the batch twin re-run).
  */
object SprtState {

  case class Bin(arm: Int, day: java.sql.Date, n: Long, x: Long)
  case class St(cum: Long)
  case class Out(arm: Int, day: java.sql.Date, n: Long, x: Long,
      llr: Double, decision: String)

  /** floor(ln(m)·2^20 + 0.5) — java.lang.Math.log, the same correctly
    * rounded libm both engines' SQL `ln` calls. */
  private def lnq(m: Long): Long =
    math.floor(math.log(m.toDouble) * LogScale.toDouble + 0.5).toLong

  /** Integer LLR increments per purchase / non-purchase event, and the
    * quantized Wald boundary — identical to the SQL-side constants. */
  private[graft] val IncBuy: Long = {
    val (p0n, _) = SprtP0; val (p1n, _) = SprtP1
    lnq(p1n) - lnq(p0n)
  }
  private[graft] val IncOther: Long = {
    val (p0n, den) = SprtP0; val (p1n, _) = SprtP1
    lnq(den - p1n) - lnq(den - p0n)
  }
  private[graft] val Bound: Long = lnq(SprtBoundArg)

  private def decision(cum: Long): String =
    if (cum >= Bound) "accept_h1"
    else if (cum <= -Bound) "accept_h0"
    else "continue"

  /** Pure fold: day-sorted bins onto the carried cumsum, one monitor row
    * per bin. Factored so cross-batch composition is testable bare. */
  def fold(cum0: Long, bins: Seq[Bin]): (Long, Seq[Out]) = {
    var cum = cum0
    val out = bins.map { b =>
      cum += b.x * IncBuy + (b.n - b.x) * IncOther
      Out(b.arm, b.day, b.n, b.x, cum.toDouble / LogScale.toDouble, decision(cum))
    }
    (cum, out)
  }

  /** Per-arm state transition shared by the batch entry and the stream. */
  def step(arm: Int, it: Iterator[Bin], state: GroupState[St]): Iterator[Out] = {
    val bins = it.toSeq.sortBy(_.day.getTime)
    val (cum, out) = fold(state.getOption.map(_.cum).getOrElse(0L), bins)
    state.update(St(cum))
    out.iterator
  }

  /** The stateful plan over any day-binned source — batch or stream. */
  def sprtOf(bins: Dataset[Bin]): Dataset[Out] = {
    implicit val stEnc  = Encoders.product[St]
    implicit val outEnc = Encoders.product[Out]
    implicit val kEnc   = Encoders.scalaInt
    bins.groupByKey(_.arm)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step _)
  }

  /** `q_sprt_state`: the batch-mode stateful twin of q_sprt_monitor. */
  def sprtStateBatch(spark: SparkSession, dir: String): DataFrame = {
    implicit val binEnc = Encoders.product[Bin]
    val ds = Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .select(pmod(col("user_id"), lit(2L)).cast(IntegerType).as("arm"),
        col("ts").cast(DateType).as("day"),
        (col("event_type") === "purchase").as("buy"))
      .groupBy(col("arm"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("buy"), 1L).otherwise(0L)).as("x"))
      .as[Bin]
    sprtOf(ds).toDF().orderBy(col("arm"), col("day"))
  }
}

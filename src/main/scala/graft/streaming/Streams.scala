package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.CoreOps

/** Structured Streaming tier (SURVEY.md §2.I stretch): the reference is
  * strictly batch, but its validate→quarantine→normalize stages are exactly
  * the shape a streaming ingest needs, so this module re-expresses them as
  * `readStream` → transforms → `writeStream` with the SAME batch functions
  * (the foreachBatch pattern) plus the streaming-only operators Spark adds:
  * event-time watermarks, tumbling-window aggregation, and stateful
  * sessionization ([[Sessionize]]).
  *
  * Scale notes: streaming state (window aggs, sessions) is partitioned by
  * grouping key across executors exactly like a batch shuffle; the watermark
  * bounds state size — without it, window state grows forever at 100 TB/day.
  */
object Streams {

  /** Streaming-readable schema of the driver's events parquet. `ts` is
    * TIMESTAMP(NANOS) in the file; with `spark.sql.legacy.parquet.nanosAsLong`
    * (set at session build) it surfaces as long nanos, truncated to
    * microseconds here exactly like the batch loader (Tables.events).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `readStream` over an events parquet directory. `maxFilesPerTrigger=1`
    * makes each file one micro-batch — the local stand-in for a file-drop
    * ingest directory.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Event-time tumbling-window aggregation with a watermark: counts and
    * value totals per (hour, event_type). Works identically on a batch frame
    * (the watermark is a no-op there), which is how the spec cross-checks
    * streaming output against the batch answer.
    *
    * The 2-hour watermark bounds state: a window closes (and, in append
    * mode, emits) once event time passes window_end + 2h, after which its
    * state is dropped — the property that keeps this runnable forever.
    */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Hopping (sliding) window aggregation: 1-hour windows every 30 minutes,
    * so each event lands in exactly two overlapping windows. Mode-agnostic
    * like [[hourlyTypeCounts]] — the watermark only matters on a stream,
    * where it bounds the two-windows-per-event state the same way it bounds
    * tumbling state. The batch run is what the DuckDB oracle checks
    * (`q_hopping_counts`): Spark's epoch-aligned window starts line up with
    * time_bucket's, so the hash must match.
    */
  def hoppingTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Streaming ingest dedup: drops re-deliveries of an event_id seen within
    * the watermark horizon — the streaming complement of the batch dedup
    * passes (at-least-once transport → exactly-once per key downstream).
    * `dropDuplicatesWithinWatermark` keys the state on event_id and EVICTS
    * entries once the watermark passes their event time, so state is
    * O(events per watermark window), never O(history) — the property a
    * plain streaming dropDuplicates lacks.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch-mode analog of [[dedupedEvents]], oracle-checkable: the testdata
    * transport layer has no duplicates, so at-least-once delivery is modeled
    * IN-QUERY — every 10th event is re-delivered, half an hour EARLY for
    * event_id % 20 == 0 (the re-delivery wins) and an hour late otherwise
    * (the original wins) — and first-delivery-wins keeps row 1 per event_id
    * ordered by (ts, delivery). The surviving `delivery` tag varies per row,
    * so the oracle hash actually proves the ordering logic, not just the
    * row count. One window shuffle on the dedup key — the batch complement
    * of the watermark-keyed streaming state.
    */
  def streamDedupBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val first = ev.withColumn("delivery", lit(1))
    val redelivered = ev.filter(col("event_id") % 10 === 0)
      .withColumn("ts",
        when(col("event_id") % 20 === 0, col("ts") - expr("INTERVAL 30 MINUTES"))
          .otherwise(col("ts") + expr("INTERVAL 1 HOUR")))
      .withColumn("delivery", lit(2))
    val w = Window.partitionBy(col("event_id")).orderBy(col("ts"), col("delivery"))
    first.unionAll(redelivered)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("delivery"))
      .orderBy(col("event_id"))
  }

  /** Batch-mode analog of [[Sessionize]], oracle-checkable: gap
    * sessionization is SQL-expressible over a bounded frame as the classic
    * cumulative gap-count — per-user lag(ts) → gap>30min flag →
    * running-sum session ordinal → groupBy session. Semantics are the SAME
    * session boundaries [[Sessionize.fold]] produces on the per-user
    * time-sorted stream (property-tied in SessionizeProps); the streaming
    * form exists because at unbounded input the window's full-history sort
    * is impossible — state must be one open session per ACTIVE user, which
    * is what `flatMapGroupsWithState` gives. Here the shuffle is one
    * user_id-partitioned window + a groupBy on (user, session_seq) that
    * reuses the window's partitioning — two narrow passes, no global sort.
    */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(ord)))
      .withColumn("new_session",
        when(col("gap_us").isNull || col("gap_us") > Sessionize.GapMs * 1000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Stream-stream attribution join — the last Structured Streaming join
    * family: purchases matched to the clicks that preceded them by at most
    * one hour, per user. Mode-agnostic: on streams the two watermarks plus
    * the time-range conjunct are what BOUND the join state (each side
    * buffers only rows younger than watermark + range — without the range
    * condition a stream-stream join would buffer forever); on a batch
    * frame the same plan is a plain equi-join with a range filter. Emits
    * every qualifying (purchase, click) pair — the streaming-legal shape
    * (append mode cannot retract a per-purchase argmax); pick-latest is a
    * batch decoration in [[attributionJoinBatch]].
    */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "2 hours")
    val p = purchases.withWatermark("purchase_ts", "2 hours")
    p.join(c,
      col("c_user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** Batch analog + attribution decoration, oracle-checkable
    * (`q_stream_join`): each purchase attributed to its LATEST qualifying
    * click (ties to the highest click_id). One user-keyed hash join + one
    * purchase-partitioned window — never a time-only cross join.
    */
  def attributionJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(lower(col("event_type")) === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(lower(col("event_type")) === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("click_ts").desc, col("click_id").desc)
    attributionPairs(clicks, purchases)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("p_user_id").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"), col("value"))
      .orderBy(col("purchase_id"))
  }

  /** The SAME gap sessions via Spark's built-in `session_window` — the
    * "compose existing ops if semantics allow" rung above the typed
    * `flatMapGroupsWithState` fold ([[Sessionize]]): one groupBy whose
    * window key MERGES as rows arrive, in batch or streaming alike.
    * session_window's own end is last_event + gap, so the fold's
    * session_end = max(ts) is re-derived in the aggregate, and the fold's
    * per-user session ordinal is a number over the merged rows (tiny:
    * sessions per user, not events). Hash-matches the `q_sessionize`
    * oracle — one oracle, two plans, built-in vs custom state proven
    * equivalent.
    */
  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame = {
    val merged = Tables.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${Sessionize.GapMs / 1000} seconds").as("w"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
    val seq = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    merged
      .withColumn("session_seq", row_number().over(seq).cast(LongType))
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** The batch validation split (A4/A9, CoreOps.eventError) applied to one
    * frame: (valid remainder, quarantine rows + reason).
    */
  def validateBatch(batch: DataFrame): (DataFrame, DataFrame) = {
    val tagged = batch.withColumn("error_message", CoreOps.eventError)
    (tagged.filter(col("error_message").isNull).drop("error_message"),
      tagged.filter(col("error_message").isNotNull)
        // Validate.rowSnapshot, not a bare to_json: jsonb keeps null fields
        // and the batch quarantine this re-enacts does too
        .withColumn("row_data", graft.etl.Validate.rowSnapshot(batch)))
  }

  /** Streaming validate→quarantine: every micro-batch runs the SAME split
    * the batch ETL runs and writes each half to its parquet sink — the
    * incremental re-enactment of ETL1's quarantine stage. `foreachBatch`
    * because one stream feeds two sinks. foreachBatch alone is only
    * at-least-once (a crash between the write and the offset commit replays
    * the batch), so each batch OVERWRITES its own `batch_id=` partition —
    * replays land on the same path and the sink is idempotent.
    */
  def quarantineSink(events: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeQuarantineBatch(batch, outDir, batchId)
      }
      .start()

  /** The per-micro-batch sink body, exposed so the at-least-once replay
    * property is directly testable (StreamingSpec): because each batch
    * overwrites ITS OWN `batch_id=` partition, applying the same batch
    * twice — exactly what a crash between the sink write and the offset
    * commit produces on restart — leaves the sink byte-identical to one
    * application. Idempotence lives here, not in foreachBatch (which is
    * only at-least-once).
    */
  def writeQuarantineBatch(batch: DataFrame, outDir: String, batchId: Long): Unit = {
    val (valid, invalid) = validateBatch(batch)
    valid.write.mode("overwrite").parquet(s"$outDir/valid/batch_id=$batchId")
    invalid.write.mode("overwrite").parquet(s"$outDir/quarantine/batch_id=$batchId")
  }
}

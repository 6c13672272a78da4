package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming tier: watermarked window aggregation, foreachBatch
  * quarantine reuse, and stateful sessionization, each cross-checked against
  * the batch answer on the same data.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourly window agg: streaming append output matches the batch answer for closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyTypeCounts(events)
      .writeStream.outputMode("append").format("memory").queryName("hourly").start()

    try {
      // hour 10: two clicks, one view
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 10.0),
        (ts("2024-01-01 10:40:00"), "click", 5.0),
        (ts("2024-01-01 10:59:00"), "view", 2.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark (max ts - 2h) hasn't passed hour 10's end
      assert(spark.table("hourly").count() === 0)

      // a 14:30 event pushes the watermark to 12:30 > 11:00 → hour 10 closes
      mem.addData((ts("2024-01-01 14:30:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 18:00:00"), "view", 1.0))
      q.processAllAvailable()

      val rows = spark.table("hourly")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains((ts("2024-01-01 10:00:00"), "click", 2L, 15.0)))
      assert(rows.contains((ts("2024-01-01 10:00:00"), "view", 1L, 2.0)))
      // the still-open 18:00 window must NOT have emitted
      assert(!rows.exists(_._1 == ts("2024-01-01 18:00:00")))
    } finally q.stop()
  }

  test("streaming PSI: append-mode drift points equal the batch series for closed days") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val history = Seq(
      (ts("2024-01-01 01:00:00"), 1.0), (ts("2024-01-01 02:00:00"), 1.0),
      (ts("2024-01-01 03:00:00"), 50.0),
      (ts("2024-01-02 01:00:00"), 50.0), (ts("2024-01-02 02:00:00"), 50.0),
      (ts("2024-01-02 03:00:00"), 1.0))
    val dir = Files.createTempDirectory("graft-spsi").toString
    history.toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val baseline = Streams.psiBaseline(spark, dir)
    val expected = Streams.psiWindowedBatch(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(expected.size === 2)

    val mem = MemoryStream[(Timestamp, Double)]
    val q = Streams.psiWindowed(mem.toDF().toDF("ts", "value"), baseline)
      .writeStream.outputMode("append").format("memory").queryName("psidrift").start()
    try {
      mem.addData(history: _*)
      q.processAllAvailable()
      // both day windows still open: watermark (max ts - 2d) is behind them
      assert(spark.table("psidrift").count() === 0)
      // a day-6 event moves the watermark past both window ends; its own
      // window stays open and must NOT emit
      mem.addData((ts("2024-01-06 00:00:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("psidrift").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming quarantine foreachBatch: sink counts equal the batch validation split") {
    val out = Files.createTempDirectory("graft-stream").toString
    // the streaming file source watches a directory (the ingest-drop model)
    val ingest = Files.createDirectories(java.nio.file.Paths.get(s"$out/ingest"))
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.01/events.parquet"),
      ingest.resolve("events.parquet"))
    val events = Streams.readEvents(spark, ingest.toString)
    val q = Streams.quarantineSink(events, out, s"$out/chk")
    q.awaitTermination()

    val batch = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val (validB, invalidB) = Streams.validateBatch(batch)
    val valid = spark.read.parquet(s"$out/valid")
    val invalid = spark.read.parquet(s"$out/quarantine")
    assert(valid.count() === validB.count())
    assert(invalid.count() === invalidB.count())
    // quarantine rows carry reason + full row_data snapshot (A4 semantics)
    assert(invalid.filter(col("error_message").isNull).count() === 0)
    assert(invalid.filter(col("row_data").contains("\"event_id\"")).count() === invalid.count())
  }

  test("quarantine sink is idempotent under at-least-once batch replay") {
    // foreachBatch is only at-least-once: a crash between the sink write
    // and the offset commit re-delivers the SAME (batch, batchId) on
    // restart. The sink's contract — each batch overwrites its own
    // batch_id= partition — must make that replay a no-op (VERDICT r4 #8).
    val out = Files.createTempDirectory("graft-replay").toString
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val (validB, invalidB) = Streams.validateBatch(batch)

    Streams.writeQuarantineBatch(batch, out, batchId = 0)
    val validOnce = spark.read.parquet(s"$out/valid").count()
    val invalidOnce = spark.read.parquet(s"$out/quarantine").count()
    assert(validOnce === validB.count())
    assert(invalidOnce === invalidB.count())

    // the replay: same batch, same id — counts and content must not change
    Streams.writeQuarantineBatch(batch, out, batchId = 0)
    assert(spark.read.parquet(s"$out/valid").count() === validOnce)
    assert(spark.read.parquet(s"$out/quarantine").count() === invalidOnce)

    // a genuinely NEW batch id appends — replay-safety is per batch, not a
    // global overwrite
    Streams.writeQuarantineBatch(batch, out, batchId = 1)
    assert(spark.read.parquet(s"$out/valid").count() === 2 * validOnce)
  }

  test("checkpoint recovery: a restarted query resumes exactly-once") {
    // stop/restart against the SAME checkpoint: the offset log must make
    // the restart process only the files that arrived while it was down —
    // never reprocessing batch 1 (the file-sink commit log gives the sink
    // side exactly-once on top of the source's offset tracking)
    val root = Files.createTempDirectory("graft-ckpt").toString
    val ingest = Files.createDirectories(java.nio.file.Paths.get(s"$root/ingest"))
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    val perFile = graft.Tables.events(spark, "/root/testdata/sf0.001").count()

    def start() = Streams.readEvents(spark, ingest.toString)
      .writeStream.format("parquet")
      .option("path", s"$root/sink")
      .option("checkpointLocation", s"$root/chk")
      .start()

    Files.copy(src, ingest.resolve("f1.parquet"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(s"$root/sink").count() === perFile)

    Files.copy(src, ingest.resolve("f2.parquet"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // exactly 2× — f1 was NOT reprocessed on restart (3× would mean the
    // checkpoint was ignored; duplicate DATA is legal, duplicate BATCHES
    // are not)
    assert(spark.read.parquet(s"$root/sink").count() === 2 * perFile)
  }

  test("streaming CDC merge: file-drop micro-batches converge to the one-shot MERGE") {
    // sf0.01, not sf0.001: the smaller SF's change keys never overlap the
    // snapshot (no 'update' rows), which would leave the MERGE half-tested
    val sf = "/root/testdata/sf0.01"
    val root = Files.createTempDirectory("graft-cdc").toString
    val ingest = Files.createDirectories(java.nio.file.Paths.get(s"$root/ingest"))
    // split the change log into two files by event_id PARITY — an
    // interleaved split, not a time split, so each micro-batch carries
    // changes that are out of order relative to the other batch; the LWW
    // register must converge regardless. ts is re-encoded as long NANOS
    // (what readEvents' schema expects): a raw file copy is wrong here
    // because this SF stores ts as TIMESTAMP(MICROS), which readEvents
    // would shrink 1000x — ordering survives (div is monotone, so the
    // convergence assert would still pass) but the redelivered batches
    // below would carry full-scale timestamps and spuriously win LWW
    val raw = graft.Tables.events(spark, sf)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
    Seq(0, 1).foreach { par =>
      val half = Files.createTempDirectory(s"graft-cdc-h$par")
      raw.filter(pmod(col("event_id"), lit(2L)) === par)
        .coalesce(1).write.mode("overwrite").parquet(half.toString)
      val part = Option(half.toFile.listFiles()).toSeq.flatten
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, ingest.resolve(s"f$par.parquet"))
    }
    val snap = graft.queries.MaintenanceOps.cdcSnapshot(spark, sf)
    val q = Streams.cdcSink(Streams.readEvents(spark, ingest.toString),
      snap, s"$root/state", s"$root/chk")
    q.awaitTermination()

    // maxFilesPerTrigger=1 → exactly two state versions
    val versions = Option(new java.io.File(s"$root/state").listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("v=")).sorted
    assert(versions === Seq("v=0", "v=1"))
    val expected = graft.queries.MaintenanceOps.cdcApply(spark, sf).collect().toSeq
    assert(expected.map(_.getString(3)).toSet === Set("insert", "update", "unchanged"),
      "fixture must exercise every action")
    val got = Streams.cdcRelease(
      spark.read.parquet(s"$root/state/${versions.last}")).collect().toSeq
    assert(got === expected)

    // out-of-order REDELIVERY long after: the even half arrives again as a
    // later batch — every change in it is equal-or-older than what the
    // state already absorbed, so the strict LWW comparison drops them all
    val evenHalf = graft.Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(2L)) === 0L)
    Streams.applyCdcBatch(snap, evenHalf, s"$root/state", batchId = 5L)
    assert(Streams.cdcRelease(
      spark.read.parquet(s"$root/state/v=5")).collect().toSeq === expected)

    // crash replay: recompute batch 1 from batch 0's state — v=1 must be
    // rebuilt with identical content. The file source's batch order isn't
    // contractual, so read which half batch 0 actually was from the
    // winning event ids v=0 retained (the LWW register keeps them for
    // exactly this kind of provenance)
    val b0Parity = spark.read.parquet(s"$root/state/v=0")
      .filter(col("event_id").isNotNull)
      .agg(max(pmod(col("event_id"), lit(2L)))).head.getLong(0)
    val batch1 = graft.Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(2L)) === (1L - b0Parity))
    Streams.applyCdcBatch(snap, batch1, s"$root/state", batchId = 1L)
    assert(Streams.cdcRelease(
      spark.read.parquet(s"$root/state/v=1")).collect().toSeq === expected)
  }

  test("streaming HLL registers: micro-batches converge to the batch sketch; replay is free") {
    val sf = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-hll").toString
    val ingest = Files.createDirectories(java.nio.file.Paths.get(s"$root/ingest"))
    // registers depend only on user_id hashes + the ts-non-null filter,
    // both invariant under the nanos re-encode readEvents expects
    val raw = graft.Tables.events(spark, sf)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
    Seq(0, 1).foreach { par =>
      val half = Files.createTempDirectory(s"graft-hll-h$par")
      raw.filter(pmod(col("event_id"), lit(2L)) === par)
        .coalesce(1).write.mode("overwrite").parquet(half.toString)
      val part = Option(half.toFile.listFiles()).toSeq.flatten
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, ingest.resolve(s"f$par.parquet"))
    }
    val q = Streams.hllSink(Streams.readEvents(spark, ingest.toString),
      s"$root/state", s"$root/chk")
    q.awaitTermination()
    val versions = Option(new java.io.File(s"$root/state").listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("v=")).sorted
    assert(versions === Seq("v=0", "v=1"))
    def regs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = regs(graft.queries.ProfileOps.hllRegisters(
      graft.Tables.events(spark, sf)
        .filter(col("user_id").isNotNull && col("ts").isNotNull),
      col("user_id"), col("event_type")))
    assert(regs(spark.read.parquet(s"$root/state/${versions.last}")) === expected)
    // redelivery of a whole half much later: MAX is idempotent, so the
    // sketch needs no LWW bookkeeping — state is bit-identical
    Streams.applyHllBatch(
      graft.Tables.events(spark, sf).filter(pmod(col("event_id"), lit(2L)) === 0L),
      s"$root/state", batchId = 7L)
    assert(regs(spark.read.parquet(s"$root/state/v=7")) === expected)
  }

  test("CDC merge plan is equivalent to the pure LWW model on seeded random logs") {
    // CdcLwwProps proves the MODEL's convergence over hundreds of random
    // schedules; this case proves the Spark PLAN computes that model —
    // together they carry the streaming sink's correctness claim.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import CdcModel._
    for (seed <- 1L to 3L) {
      val snapKeys = (3L to 12L).filter(k => (k + seed) % 3 != 0)
      val snap = snapKeys.map(k => k -> ((s"n$k", k * 10.0))).toMap
      val gEv = for {
        k <- Gen.choose(0L, 15L)
        t <- Gen.choose(0L, 5L)
        op <- Gen.frequency(4 -> Gen.const("set"), 1 -> Gen.const("error"))
        v <- Gen.choose(0, 1000).map(_ / 10.0)
      } yield (k, t, op, v)
      val log = (0 until 30).map { i =>
        val (k, t, op, v) = gEv.pureApply(Gen.Parameters.default, Seed(seed * 100 + i))
        Ev(k, i.toLong, t, op, v)
      }
      // model: two batches split by eid parity, odd batch first (out of order)
      val (even, odd) = log.partition(_.eid % 2 == 0)
      val expected = release(Seq(odd, even).foldLeft(init(snap))(merge))

      // plan: same snapshot/batches as DataFrames through the real operators
      import spark.implicits._
      val snapDf = snap.toSeq.map { case (k, (n, v)) => (k, n, v) }
        .toDF("key", "name", "snap_val")
      def batchDf(evs: Seq[Ev]) = evs
        .map(e => (e.key, e.op, e.value, e.ts, e.eid))
        .toDF("user_id", "event_type", "value", "tsl", "event_id")
        .withColumn("ts", expr("timestamp_micros(tsl)")).drop("tsl")
      val state = Seq(odd, even).map(batchDf)
        .foldLeft(Streams.cdcInitState(snapDf))(Streams.cdcMergeState)
      val got = Streams.cdcRelease(state).collect()
        .map(r => r.getLong(0) -> ((Option(r.getString(1)),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3)))).toMap
      assert(got === expected, s"seed $seed diverged")
    }
  }

  test("hopping windows: each event lands in exactly its two overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = Streams.hoppingTypeCounts(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("append").format("memory").queryName("hopping").start()

    try {
      // 10:40 belongs to [10:00, 11:00) and [10:30, 11:30); 10:10 to
      // [09:30,10:30) and [10:00,11:00)
      mem.addData(
        (ts("2024-01-01 10:40:00"), "click", 1.0),
        (ts("2024-01-01 10:10:00"), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far enough (2h + window) to close them all
      mem.addData((ts("2024-01-01 18:00:00"), "view", 1.0))
      q.processAllAvailable()

      val rows = spark.table("hopping")
        .select("window_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        (ts("2024-01-01 09:30:00"), "click", 1L),
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 10:30:00"), "click", 1L)))
    } finally q.stop()
  }

  test("stream-stream join: purchases pair with clicks inside the hour window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val memC = MemoryStream[(Long, Long, Timestamp)]
    val memP = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = Streams.attributionPairs(
      memC.toDF().toDF("c_user_id", "click_id", "click_ts"),
      memP.toDF().toDF("p_user_id", "purchase_id", "purchase_ts", "value"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()

    try {
      memC.addData(
        (1L, 101L, ts("2024-01-01 10:00:00")),
        (1L, 102L, ts("2024-01-01 10:30:00")),
        (2L, 103L, ts("2024-01-01 10:00:00")))
      memP.addData(
        (1L, 201L, ts("2024-01-01 10:45:00"), 9.0), // both user-1 clicks qualify
        (1L, 202L, ts("2024-01-01 11:35:00"), 7.0), // 10:30 click is 65 min old — none
        (2L, 203L, ts("2024-01-01 10:10:00"), 5.0)) // user-2 click qualifies
      q.processAllAvailable()

      val pairs = spark.table("attrib")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((201L, 101L), (201L, 102L), (203L, 103L)))
    } finally q.stop()
  }

  test("streaming ingest dedup: re-delivered event ids are dropped within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.dedupedEvents(mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()

    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 5.0),
        (1L, ts("2024-01-01 10:00:00"), 5.0), // same-batch redelivery
        (2L, ts("2024-01-01 10:05:00"), 7.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:30:00"), 5.0)) // cross-batch redelivery
      q.processAllAvailable()

      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).toList
      assert(ids.sorted === List(1L, 2L))
    } finally q.stop()
  }

  test("sessionization: gaps split sessions; event-time timeout flushes the final one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Sessionize.Ev]
    val q = Sessionize.sessions(
      mem.toDS().withWatermark("ts", "0 seconds").as[Sessionize.Ev])
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()

    try {
      // user 1: three events 10 min apart (one session), then a 2 h gap
      mem.addData(
        Sessionize.Ev(1L, ts("2024-01-01 09:00:00"), "click"),
        Sessionize.Ev(1L, ts("2024-01-01 09:10:00"), "view"),
        Sessionize.Ev(1L, ts("2024-01-01 09:20:00"), "click"))
      q.processAllAvailable()
      // same batch-key fold: a later event past the gap closes session 1 inline
      mem.addData(
        Sessionize.Ev(1L, ts("2024-01-01 11:20:00"), "click"),
        Sessionize.Ev(2L, ts("2024-01-01 11:25:00"), "view"))
      q.processAllAvailable()
      // advance the watermark far past 11:20+gap so the timeout fires for both users
      mem.addData(Sessionize.Ev(3L, ts("2024-01-01 15:00:00"), "click"))
      q.processAllAvailable()
      mem.addData(Sessionize.Ev(3L, ts("2024-01-01 15:01:00"), "click"))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
        .toSet
      assert(got.contains((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:20:00"), 3)))
      assert(got.contains((1L, ts("2024-01-01 11:20:00"), ts("2024-01-01 11:20:00"), 1)))
      assert(got.contains((2L, ts("2024-01-01 11:25:00"), ts("2024-01-01 11:25:00"), 1)))
    } finally q.stop()
  }

  test("stateful ewma: incremental micro-batches land on the batch fold bit-for-bit") {
    import graft.streaming.EwmaState
    import graft.streaming.EwmaState.Ev
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Seq(
      // user 1: four values split 2+1+1 across batches; user 2: 1+1;
      // user 3 appears only in the last batch
      Ev(1L, 1000L, 1L, 10.0), Ev(1L, 2000L, 2L, 20.0),
      Ev(2L, 1000L, 3L, 5.0),
      Ev(1L, 3000L, 4L, 40.0), Ev(2L, 4000L, 5L, 7.5),
      Ev(1L, 4000L, 6L, 0.25), Ev(3L, 1000L, 7L, 3.0))
    val batches = Seq(events.take(3), events.slice(3, 5), events.drop(5))

    val mem = MemoryStream[Ev]
    val q = EwmaState.ewmaOf(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName("ewma_st").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // latest emission per user = the final carried state
      val got = spark.table("ewma_st").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap.values.toSet
      // the batch-mode twin over the same rows, one shot
      val batch = EwmaState.ewmaOf(events.toDS()).collect()
        .map(o => (o.user_id, o.n, o.ewma)).toSet
      assert(got === batch)
      // and both equal the pure fold of the full per-user history
      val expect = events.groupBy(_.user_id).map { case (u, es) =>
        val st = EwmaState.fold(None, es.sortBy(e => (e.ts, e.event_id)).map(_.value)).get
        (u, st.n, st.ewma)
      }.toSet
      assert(batch === expect)
    } finally q.stop()
  }

  test("stateful sprt: day bins fed across micro-batches emit the batch rows bit-for-bit") {
    import graft.streaming.SprtState
    import graft.streaming.SprtState.Bin
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def d(s: String) = java.sql.Date.valueOf(s)
    // arm 0 crosses +ln19 on day 2 (100 straight conversions); arm 1 sinks
    // toward accept_h0; bins arrive day-ordered per arm, split mid-history
    val bins = Seq(
      Bin(0, d("2024-01-01"), 4, 2), Bin(1, d("2024-01-01"), 4, 2),
      Bin(0, d("2024-01-02"), 100, 100),
      Bin(1, d("2024-01-02"), 120, 0), Bin(0, d("2024-01-03"), 3, 1))
    val batches = Seq(bins.take(2), bins.slice(2, 4), bins.drop(4))

    val mem = MemoryStream[Bin]
    val q = SprtState.sprtOf(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sprt_st").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("sprt_st").collect()
        .map(r => (r.getInt(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getString(5))).toSet
      // every bin emitted exactly once, with the carried cumsum
      assert(got.size === bins.size)
      val batch = SprtState.sprtOf(bins.toDS()).collect()
        .map(o => (o.arm, o.day.toString, o.n, o.x, o.llr, o.decision)).toSet
      assert(got === batch)
      // and both equal the pure whole-history fold per arm
      val expect = bins.groupBy(_.arm).flatMap { case (_, bs) =>
        SprtState.fold(0L, bs.sortBy(_.day.getTime))._2
      }.map(o => (o.arm, o.day.toString, o.n, o.x, o.llr, o.decision)).toSet
      assert(batch === expect)
      // the planted boundary crossings really happen
      assert(got.exists(r => r._1 == 0 && r._6 == "accept_h1"))
      assert(got.exists(r => r._1 == 1 && r._6 == "accept_h0"))
    } finally q.stop()
  }
}

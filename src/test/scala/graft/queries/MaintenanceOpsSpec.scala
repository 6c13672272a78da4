package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table-maintenance operators: fixture pins for every CDC action kind and
  * the last-writer-wins tie-break, hand-computed skew percentiles, and the
  * compaction-plan ceil boundaries — the edge cases the generated corpus
  * cannot be relied on to exercise at every SF.
  */
class MaintenanceOpsSpec extends SparkSpec {

  /** Nanos-long ts at minute `m` (Tables.events truncates to micros). */
  private def ts(m: Int): Long = m * 60L * 1000000000L

  test("cdc apply: all four actions and last-writer-wins on a pinned fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    Seq(
      (50L, "cust50", 10.0),   // updated twice; latest (ts tie, higher id) wins
      (60L, "cust60", 20.0),   // latest change is a tombstone -> deleted
      (150L, "cust150", 30.0)) // no change -> unchanged
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (1L, ts(1), 50L, "click", 1.0),
      (2L, ts(2), 50L, "view", 2.0),     // same ts as id 3 -> event_id breaks
      (3L, ts(2), 50L, "purchase", 3.0), // the tie: this one wins
      (4L, ts(1), 60L, "click", 4.0),
      (5L, ts(2), 60L, "error", 0.0),    // tombstone last -> delete
      (6L, ts(1), 70L, "signup", 6.0),   // not in snapshot -> insert
      (7L, ts(1), 80L, "signup", 7.0),
      (8L, ts(2), 80L, "error", 0.0))    // insert then tombstone -> absent
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = MaintenanceOps.cdcApply(spark, dir).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), r.getDouble(2), r.getString(3))))
      .toMap
    assert(rows.keySet === Set(50L, 70L, 150L)) // 60 deleted, 80 never lands
    assert(rows(50L) === ((Some("cust50"), 3.0, "update")))
    assert(rows(70L) === ((None, 6.0, "insert"))) // log carries no name
    assert(rows(150L) === ((Some("cust150"), 30.0, "unchanged")))
  }

  test("skew report: hand-computed percentiles and ratio") {
    import spark.implicits._
    // per-key counts: a->1, b->1, c->2, d->4 (8 rows, 4 keys)
    val df = Seq("a", "b", "c", "c", "d", "d", "d", "d").toDF("k")
    val r = MaintenanceOps.keyCountReport(df, "k", "fixture").collect()(0)
    assert(r.getLong(1) === 4L && r.getLong(2) === 8L && r.getLong(3) === 4L)
    // sorted counts [1,1,2,4]: p50 at idx 1.5 -> 1.5; p99 at idx 2.97 -> 3.94
    assert(r.getDouble(4) === 1.5)
    assert(math.abs(r.getDouble(5) - 3.94) < 1e-12)
    assert(r.getDouble(6) === 2.0) // max 4 / avg 2
  }

  test("compaction plan: ceil boundaries and the saved-files clamp") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // srcA/en: 3 batches, exactly one target file's worth -> saves 2
    // srcA/fr: 2 batches, one char over a file -> plans 2, saves 0
    // srcB/en: 1 batch, tiny -> plans max(1, 0)=1, saved clamps at 0
    Seq(
      (0L, "srcA", "en", 30000L), (1L, "srcA", "en", 30000L), (2L, "srcA", "en", 5536L),
      (3L, "srcA", "fr", 65537L), (24L, "srcA", "fr", 0L),
      (5L, "srcB", "en", 10L))
      .toDF("doc_id", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = MaintenanceOps.compactionPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(rows(("srcA", "en")) === ((3L, 65536L, 3L, 1L, 2L)))
    assert(rows(("srcA", "fr")) === ((2L, 65537L, 2L, 2L, 0L)))
    assert(rows(("srcB", "en")) === ((1L, 10L, 1L, 1L, 0L)))
  }

  test("data diff: all four statuses from the derived versions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-diff").toString
    Seq(
      (1L, "s", "x one"),   // in both, same text -> unchanged
      (7L, "s", "x seven"), // 7 % 7 = 0: absent from v1 -> added
      (13L, "s", "x 13"),   // 13 % 13 = 0: absent from v2 -> removed
      (22L, "s", "x 22"),   // 22 % 11 = 0: re-extracted (upper) -> changed
      (91L, "s", "x 91"))   // 91 = 7*13: in neither version -> no row
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = MaintenanceOps.dataDiff(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows === Map(
      "added" -> 1L, "removed" -> 1L, "changed" -> 1L, "unchanged" -> 1L))
  }

  test("data diff: pure-digit re-extraction is a no-op (upper fixed point)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-diff2").toString
    // doc 33 is re-extracted (33 % 11 = 0) but has no cased letters, so
    // its checksum is identical -> unchanged, not changed
    Seq((33L, "s", "123 456")).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = MaintenanceOps.dataDiff(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(rows === Array(("unchanged", 1L)))
  }

  test("skew report on the corpus: row conservation and ordering invariants") {
    val rows = MaintenanceOps.skewReport(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("events.user_id", "lineitem.l_orderkey", "orders.o_custkey"))
    for (r <- rows) {
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1))
      assert(r.getDouble(4) <= r.getDouble(5) && r.getDouble(5) <= r.getLong(3).toDouble)
      val expected = r.getLong(3).toDouble / (r.getLong(2).toDouble / r.getLong(1))
      assert(math.abs(r.getDouble(6) - expected) < 1e-9)
    }
  }

  test("ivm: signed-delta merge equals a from-scratch recompute, in-engine") {
    val sf = "/root/testdata/sf0.001"
    val got = MaintenanceOps.ivmApply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // recompute the final state directly (no view, no delta) in Spark
    // itself: proves the abelian-group algebra inside ONE engine, so the
    // oracle check can only fail on cross-engine grounds
    val want = graft.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 11 =!= 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
    // the batch genuinely exercised both directions
    val base = graft.Tables.orders(spark, sf).filter(col("o_orderkey") % 7 =!= 0)
    assert(base.filter(col("o_orderkey") % 11 === 0).count() > 0) // deletes
  }

  test("ivm join: bilinear signed delta equals a from-scratch recompute, in-engine") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val sf = "/root/testdata/sf0.001"
    val got = MaintenanceOps.ivmJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // recompute from the FINAL state of BOTH tables inside Spark itself
    val fo = graft.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey").as("ok"), col("o_custkey"))
    val fl = graft.Tables.lineitem(spark, sf)
      .filter((col("l_orderkey") + col("l_linenumber")) % 13 === 0 ||
        (col("l_orderkey") + col("l_linenumber")) % 17 =!= 0)
      .select(col("l_orderkey").as("ok"),
        col("l_quantity").cast(DecimalType(12, 2)).as("qty"))
    val want = fo.join(fl, Seq("ok"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).cast(DoubleType).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
    // the delta exercised all three bilinear terms, both weight signs
    val o = graft.Tables.orders(spark, sf).select(col("o_orderkey").as("ok"))
    val l = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val dOk = o.filter(col("ok") % 7 === 0)
      .unionByName(o.filter(col("ok") % 7 =!= 0 && col("ok") % 11 === 0))
    val dLk = l.filter((col("ok") + col("ln")) % 13 === 0)
      .unionByName(l.filter((col("ok") + col("ln")) % 13 =!= 0 &&
        (col("ok") + col("ln")) % 17 === 0))
    assert(dOk.join(dLk.select(col("ok")).distinct(), Seq("ok")).count() > 0,
      "the dA*dB cross term never fired — weaken the delta rules")
  }

  test("zonemap audit: clustered column prunes, unclustered column cannot") {
    // sf0.01, not sf0.001: the zero-skip claim for the unclustered column
    // needs files with real mass (~190 orders/month; at sf0.001 a 2-order
    // month can miss the top decile by chance and "skip")
    val sf = "/root/testdata/sf0.01"
    val rows = MaintenanceOps.zonemapAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val nFiles = rows("date_between").getLong(1)
    assert(nFiles === rows("price_gt").getLong(1) && nFiles > 10)
    // order date is correlated with the monthly file layout: the ~3-month
    // probe window leaves all other files skippable
    assert(rows("date_between").getLong(2) >= nFiles - 5)
    assert(rows("date_between").getDouble(4) > 0.9)
    // price is uniform within every month: min/max spans the probe in
    // every file with real mass, so pruning is negligible (only the
    // trailing partial month — 2 orders — can miss the top decile).
    // That asymmetry IS the re-clustering motivation.
    assert(rows("price_gt").getDouble(4) < 0.05)
    assert(rows("price_gt").getLong(3) < 10L) // rows skipped: tail crumbs only
  }
}

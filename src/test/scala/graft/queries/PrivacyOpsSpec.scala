package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Privacy-tier operators: exact fixture pins for the redaction strings and
  * the full k-anonymity generalization ladder (including the level-0
  * withhold path the generated corpus does not reach at every SF), plus
  * invariants over the driver testdata.
  */
class PrivacyOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Nanos-long ts for hour `h` of epoch day `d` (epoch day 0 = Thursday,
    * so Spark dayofweek(d0)=5; the fixture picks days by that mapping). */
  private def ts(d: Int, h: Int): Long = (d * 86400L + h * 3600L) * 1000000000L

  test("pii redact: exact masking and counts on a pinned fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (1L, ts(0, 0), 7L, "signup"),
      (2L, ts(0, 1), 300L, "click"),
      (3L, ts(0, 2), 12L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = PrivacyOps.piiRedact(spark, dir).collect().map(r =>
      r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    assert(rows(1L) === ((2, 0, 1,
      "contact <EMAIL> alt <EMAIL> from <IP>")))
    assert(rows(2L) === ((1, 1, 1,
      "contact <EMAIL> call <PHONE> from <IP>")))
    assert(rows(3L) === ((1, 0, 1,
      "contact <EMAIL> from <IP>")))
  }

  test("pii redact: nothing PII-shaped survives redaction on the corpus") {
    val out = PrivacyOps.piiRedact(spark, sf).cache()
    for (re <- Seq(PrivacyOps.EmailRe, PrivacyOps.PhoneRe, PrivacyOps.IpRe))
      assert(out.filter(col("redacted").rlike(re)).count() === 0)
    // every planted email was found: mask count == detection count
    assert(out.filter(
      size(regexp_extract_all(col("redacted"), lit("<EMAIL>"), lit(0))) =!= col("n_emails"))
      .count() === 0)
    assert(out.filter(col("n_ips") =!= 1).count() === 0)
    out.unpersist()
  }

  test("k-anonymity: full ladder (release / generalize / withhold) on a pinned fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kanon").toString
    // d4=Monday(dow 2), d3=Sunday(1), d2=Saturday(7)
    val rows =
      (101L to 125L).map(u => (u, ts(4, 0), u, "click")) ++   // 25 users: L1 release
      (101L to 105L).map(u => (u, ts(4, 1), u, "click")) ++   // 5 users  \ union 12
      (103L to 112L).map(u => (u, ts(3, 1), u, "click")) ++   //  10 users / -> withhold
      (101L to 116L).map(u => (u, ts(4, 2), u, "view")) ++    // 16 users \ union 25
      (110L to 125L).map(u => (u, ts(2, 2), u, "view"))       //  16 users / -> L2 release
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = PrivacyOps.kanonRelease(spark, dir).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(out === Map(
      ("click", 0, "2") -> ((25L, 25L, 1)),   // released as-is
      ("click", 1, "*") -> ((15L, 12L, 0)),   // generalized, still < k: withheld
      ("view", 2, "*") -> ((32L, 25L, 2))))   // generalized union reaches k
  }

  test("k-anonymity: released cells always have >= k distinct users on the corpus") {
    val out = PrivacyOps.kanonRelease(spark, sf).cache()
    assert(out.filter(!col("anon_level").isin(0, 1, 2)).count() === 0)
    assert(out.filter(col("anon_level") >= 1 && col("n_users") < PrivacyOps.KAnon).count() === 0)
    assert(out.filter(col("anon_level") === 0 && col("n_users") >= PrivacyOps.KAnon).count() === 0)
    // generalized rows carry the coarsened label
    assert(out.filter(col("anon_level") =!= 1 && col("dow") =!= "*").count() === 0)
    out.unpersist()
  }

  test("dpCounts: scalar replica of the deterministic Laplace draw") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dp").toString
    (Seq.fill(3)("alpha") ++ Seq.fill(5)("beta")).map(Tuple1(_))
      .toDF("source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    def lnq(m: Long): Long =
      math.floor(math.log(m.toDouble) * (1L << 20) + 0.5).toLong
    def noiseMilli(src: String): Long = {
      val m = PrivacyOps.DpHalfRange
      val v = h32(s"dp|$src") % (2 * m) - m
      val mag = math.max(lnq(m) - lnq(math.abs(v) + 1), 0L)
      (if (v < 0) -1L else 1L) * (PrivacyOps.DpBMilli * mag / (1L << 20))
    }
    val got = PrivacyOps.dpCounts(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for ((src, n) <- Seq(("alpha", 3L), ("beta", 5L))) {
      val nm = noiseMilli(src)
      assert(got(src) === ((n, nm, (n * 1000 + nm).toDouble / 1000.0)), src)
      // the release really is perturbed but within the Laplace tail
      assert(math.abs(nm) <= PrivacyOps.DpBMilli * 20)
    }
    assert(got.values.exists(_._2 != 0L)) // at least one nonzero draw
    // the output table itself signals there is no real privacy guarantee:
    // epsilon is NOMINAL and the noise a deterministic replica (ADVICE r12)
    val cols = PrivacyOps.dpCounts(spark, dir).columns
    assert(cols.contains("epsilon_nominal") && cols.contains("deterministic_replica"))
    assert(!cols.contains("epsilon"))
    assert(PrivacyOps.dpCounts(spark, dir)
      .select("deterministic_replica").collect().forall(_.getBoolean(0)))
  }

  test("dp median: true bin is the exact median bin; flags honest") {
    import graft.Tables
    import graft.queries.StatsOps.{PsiBinCents, PsiBins}
    val out = PrivacyOps.dpMedian(spark, sf).collect()
    assert(out.nonEmpty)
    val e = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .withColumn("bin", greatest(least(
        expr(s"CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div $PsiBinCents"),
        lit(PsiBins - 1)), lit(0L)))
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val bins = e.filter(col("event_type") === t)
        .select(col("bin")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      val n = bins.length.toLong
      assert(r.getAs[Long]("n") === n)
      // the utility-argmax bin minimizes |2*cum - n| (min bin on ties) —
      // recompute it directly from the sorted bin multiset
      val trueBin = (0L until PsiBins).minBy { b =>
        (math.abs(2 * bins.count(_ <= b) - n), b)
      }
      assert(r.getAs[Long]("true_median_bin") === trueBin)
      val rel = r.getAs[Long]("released_bin")
      assert(rel >= 0 && rel < PsiBins)
      assert(r.getAs[Double]("epsilon_nominal") > 0)
      assert(r.getAs[Boolean]("deterministic_replica"))
    }
    // deterministic: identical release on re-run
    val again = PrivacyOps.dpMedian(spark, sf).collect()
    assert(out.map(_.toSeq.toList).toList === again.map(_.toSeq.toList).toList)
  }

  test("forget user: audit reconciles with direct cohort counts") {
    import graft.Tables
    val out = PrivacyOps.forgetUser(spark, sf).collect()
    assert(out.nonEmpty)
    val e = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val cohort = (TextOps.h32(concat(lit("forget|"),
      col("user_id").cast("string"))) % PrivacyOps.ForgetMod) === 0L
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val et = e.filter(col("event_type") === t)
      // row counts reconcile with a direct purge classification
      assert(r.getAs[Long]("rows_purged") === et.filter(cohort).count())
      assert(r.getAs[Long]("rows_kept") === et.filter(!cohort).count())
      // user counts partition the type's distinct users
      val users = et.select(col("user_id")).distinct().count()
      assert(r.getAs[Long]("users_purged") + r.getAs[Long]("users_kept") === users)
      val frac = r.getAs[Double]("purge_frac")
      assert(frac >= 0.0 && frac < 0.5) // ~1/20 cohort, loose envelope
    }
  }
}

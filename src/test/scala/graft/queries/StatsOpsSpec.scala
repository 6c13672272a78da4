package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Hand-computed fixtures for the classical-statistics tier: exact ±1
  * correlations, an alternating series whose lag-1/lag-2 autocorrelations
  * are exactly ∓1, a four-order Benford table, a KS fixture that spans
  * the two-level prefix-sum's bucket boundary, and a changepoint series
  * with a hand-folded deviation maximum.
  */
class StatsOpsSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("corrMatrix: exact +1 / -1 on linear columns, NULL on a constant") {
    import spark.implicits._
    val dir = tmp("corr")
    Seq(
      (1.0, 10.0, 0.03, 0.05),
      (2.0, 20.0, 0.02, 0.05),
      (3.0, 30.0, 0.01, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = StatsOps.corrMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> Option(r.get(3))).toMap
    assert(rows(("extendedprice", "quantity")) === Some(1.0))
    assert(rows(("discount", "quantity")) === Some(-1.0))
    assert(rows(("discount", "extendedprice")) === Some(-1.0))
    // tax is constant: zero variance => nullif'd denominator, NULL on
    // BOTH engines (bare 0/0 would raise under ANSI and NaN-diverge)
    assert(rows(("quantity", "tax")) === None)
    assert(rows.size === 6)
  }

  test("autocorr: alternating daily series gives lag1 = -1, lag2 = +1") {
    import spark.implicits._
    val dir = tmp("acf")
    // counts 1,3,1,3,... on 8 consecutive days: odd days get 3 orders
    val rows = (0 until 8).flatMap { d =>
      val n = if (d % 2 == 1) 3 else 1
      Seq.fill(n)(Timestamp.valueOf(f"1995-01-${d + 1}%02d 00:00:00"))
    }
    rows.toDF("o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val acf = StatsOps.autocorr(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(acf(1L) === ((7L, Some(-1.0))))
    assert(acf(2L) === ((6L, Some(1.0))))
    // a single pair at the max lag has zero variance: NULL, not a raise
    assert(acf(7L) === ((1L, None)))
  }

  test("benford: digits from exact cents, quantized log10 expectations") {
    import spark.implicits._
    val dir = tmp("benford")
    Seq(1.00, 19.99, 9.00, 2.50).toDF("o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = StatsOps.benford(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.keySet === Set(1L, 2L, 9L))
    assert(rows(1L)._1 === 2L)
    assert(rows(1L)._2 === 0.5)
    assert(math.abs(rows(1L)._3 - math.log10(2.0)) < 1e-5)
    assert(math.abs(rows(9L)._3 - (math.log10(10.0) - math.log10(9.0))) < 1e-5)
  }

  test("ksTest: exact rational D across the bucket boundary") {
    import spark.implicits._
    val dir = tmp("ks")
    // src0 lengths {10, 100}, src1 lengths {10, 200}: F agrees at 10,
    // diverges maximally after 100 (2/2 vs 1/2), re-converges at 200.
    // 10 lives in bucket 0, 100 in bucket 1, 200 in bucket 3 — the
    // cross-bucket offset path is exercised, not just the in-bucket
    // cumsum.
    Seq((1L, "src0", 10L), (2L, "src0", 100L), (3L, "src1", 10L), (4L, "src1", 200L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = StatsOps.ksTest(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 2L)      // n1
    assert(r(0).getLong(1) === 2L)      // n2
    assert(r(0).getLong(2) === 100L)    // at_value
    assert(r(0).getLong(3) === 2L)      // d_num = |2*2 - 1*2|
    assert(r(0).getDouble(4) === 0.5)   // D = 2 / (2*2)
  }

  test("mannWhitney: cross-sample tie takes the exact midrank") {
    import spark.implicits._
    val dir = tmp("mw")
    // combined sorted: 10 (rank 1), 20,20 (midrank 2.5 each), 40 (rank 4)
    // R1 = 1 + 2.5 = 3.5 -> U1 = 3.5 - 3 = 0.5, auc = 0.5/4
    Seq((1L, "src0", 10L), (2L, "src0", 20L), (3L, "src1", 20L), (4L, "src1", 40L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = StatsOps.mannWhitney(spark, dir).collect()
    assert(r.length === 1)
    assert((r(0).getLong(0), r(0).getLong(1)) === ((2L, 2L)))
    assert(r(0).getDouble(2) === 0.5)   // u1
    assert(r(0).getDouble(3) === 3.5)   // u2 = n1*n2 - u1
    assert(r(0).getDouble(4) === 0.125) // auc
  }

  test("welchTtest: moments and closed forms against a scalar replica") {
    import spark.implicits._
    val dir = tmp("welch")
    Seq(("AUTOMOBILE", 1.00), ("AUTOMOBILE", 2.00), ("AUTOMOBILE", 3.00),
        ("BUILDING", 2.00), ("BUILDING", 4.00), ("MACHINERY", 99.0))
      .toDF("c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = StatsOps.welchTtest(spark, dir).collect().head
    // replica in cents, same operation order as the op/oracle
    val (n1, s1, ss1) = (3.0, 600.0, 140000.0)
    val (n2, s2, ss2) = (2.0, 600.0, 200000.0)
    val (v1, v2) = ((ss1 - s1 * s1 / n1) / (n1 - 1.0), (ss2 - s2 * s2 / n2) / (n2 - 1.0))
    val (e1, e2) = (v1 / n1, v2 / n2)
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 200.0) // mean1 (cents)
    assert(r.getDouble(3) === 300.0)
    assert(r.getDouble(4) === (s1 / n1 - s2 / n2) / math.sqrt(e1 + e2))
    assert(r.getDouble(5) ===
      (e1 + e2) * (e1 + e2) / (e1 * e1 / (n1 - 1.0) + e2 * e2 / (n2 - 1.0)))
  }

  test("anova: F from exact group moments, pinned cross-group fold") {
    import spark.implicits._
    val dir = tmp("anova")
    Seq(("1-URGENT", 1.00), ("1-URGENT", 2.00), ("1-URGENT", 3.00),
        ("2-HIGH", 4.00), ("2-HIGH", 5.00), ("2-HIGH", 6.00))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.anova(spark, dir).collect().head
    // cents: groups {100,200,300} and {400,500,600}; grand = 2100, n = 6
    // SSB = (600^2/3 + 1500^2/3) - 2100^2/6 = 870000 - 735000 = 135000
    // SSW = (140000 + 770000) - 870000 = 40000
    assert((r.getLong(0), r.getLong(1)) === ((2L, 6L)))
    assert(r.getDouble(2) === 135000.0)
    assert(r.getDouble(3) === 40000.0)
    assert(r.getDouble(4) === (135000.0 / 1.0) / (40000.0 / 4.0))
    assert(r.getDouble(5) === 135000.0 / 175000.0)
  }

  test("forecastEval: exact MAEs on a weekly-periodic series with one shock") {
    import spark.implicits._
    val dir = tmp("fc")
    // 21 days of a perfect weekly cycle (value = dow+1 dollars), except
    // day 15 is shocked +10. Eval days 7..20 (need t-1 and t-7).
    val rows = (0 until 21).map { d =>
      val v = (d % 7 + 1).toDouble + (if (d == 15) 10.0 else 0.0)
      (Timestamp.valueOf(f"1995-01-${d + 1}%02d 00:00:00"), v)
    }
    rows.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.forecastEval(spark, dir).collect().head
    assert(r.getLong(0) === 14L)
    // naive-1 errors: |x_t - x_{t-1}| = 100 cents except at the weekly
    // wrap (600) and around the shock; seasonal-naive errors are 0
    // except days 15 (1000) and 22>20 — only 15. Hand-folded sums:
    // ae1: 12 normal transitions of 100 + wraps at t=7,14 of 600 each
    //      -> replaced at t=15: |12+10-1|*? compute directly below
    val series = (0 until 21).map(d => ((d % 7 + 1) * 100L) + (if (d == 15) 1000L else 0L))
    val evalDays = 7 until 21
    val ae1 = evalDays.map(t => math.abs(series(t) - series(t - 1))).sum
    val ae7 = evalDays.map(t => math.abs(series(t) - series(t - 7))).sum
    assert(r.getDouble(1) === ae1.toDouble / 14.0)
    assert(r.getDouble(2) === ae7.toDouble / 14.0)
    assert(r.getDouble(3) === 1.0 - ae7.toDouble / ae1.toDouble)
    // the weekly model must beat naive-1 on a weekly series
    assert(r.getDouble(3) > 0.5)
  }

  test("jackknife: exact mean; zero variance when every row is identical") {
    import spark.implicits._
    val dir = tmp("jk")
    (1L to 10L).map(k => (k, 5.00)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.jackknife(spark, dir).collect().head
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) <= StatsOps.JkBuckets)
    // identical rows: every leave-one-out mean equals the mean -> se 0,
    // CI collapses to the exact point
    assert(r.getDouble(2) === 500.0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 500.0)
    assert(r.getDouble(5) === 500.0)
    // heterogeneous values: strictly positive spread, CI brackets the mean
    val dir2 = tmp("jk2")
    (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val r2 = StatsOps.jackknife(spark, dir2).collect().head
    assert(r2.getDouble(3) > 0.0)
    assert(r2.getDouble(4) < r2.getDouble(2) && r2.getDouble(2) < r2.getDouble(5))
  }

  test("changepoint: hand-folded max deviation and min-day tiebreak") {
    import spark.implicits._
    val dir = tmp("chg")
    def ts(day: Int): Long = day * 86400L * 1000000000L // nanos-long fixture
    val rows =
      // type a: constant rate -> deviation 0 everywhere, best_day = first
      (0 until 3).flatMap(d => Seq.fill(2)((ts(d), "a"))) ++
      // type b: 1,1,1,1,5,5 over six days; dev = |prefix*6 - t*14| peaks
      // at t=4 (|24-56| = 32), so best_day = day 3, frac = 32/84
      (0 until 6).flatMap(d => Seq.fill(if (d >= 4) 5 else 1)((ts(d), "b")))
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = StatsOps.changepoint(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDate(3).toString, r.getDouble(4)))).toMap
    assert(m("a") === ((3L, 6L, "1970-01-01", 0.0)))
    assert(m("b") === ((6L, 14L, "1970-01-04", 32.0 / 84.0)))
  }

  /** Scala replica of TextOps.h32 / the oracle's h32Sql — first 8 md5 hex
    * digits as a long — so score-dependent fixtures can be hand-folded. */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 8), 16)
  }

  test("calibration: bins and ECE match a scalar md5 replica") {
    import spark.implicits._
    val dir = tmp("cal")
    val n = 200
    val rows = (0 until n).map { i =>
      (i.toLong, if (i % 4 == 0) "purchase" else "click",
        Timestamp.valueOf("2024-01-05 00:00:00"))
    }
    rows.toDF("event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // scalar replica, same operation order
    val per = (0 until n).map { i =>
      val milli = h32(i.toString) % 1000L
      (milli * StatsOps.CalBins / 1000L, milli, if (i % 4 == 0) 1L else 0L)
    }
    val exp = per.groupBy(_._1).map { case (bin, xs) =>
      val nn = xs.size.toLong
      val sm = xs.map(_._2).sum
      val np = xs.map(_._3).sum
      val mc = sm.toDouble / (nn.toDouble * 1000.0)
      val fp = np.toDouble / nn.toDouble
      bin -> ((nn, np, mc, fp, math.abs(fp - mc)))
    }
    val ece = exp.toSeq.sortBy(_._1)
      .foldLeft(0.0) { case (a, (_, (nn, _, _, _, g))) => a + nn.toDouble * g } / n.toDouble
    val got = StatsOps.calibration(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq === exp.keys.toSeq.sorted)
    got.foreach { r =>
      val (nn, np, mc, fp, g) = exp(r.getLong(0))
      assert((r.getLong(1), r.getLong(2)) === ((nn, np)))
      assert(r.getDouble(3) === mc && r.getDouble(4) === fp && r.getDouble(5) === g)
      assert(r.getDouble(6) === ece)
    }
  }

  test("psi: zero on identical halves, positive on a full bin shift") {
    import spark.implicits._
    val dir = tmp("psi")
    // every value appears once in days 1-15 and once in days 16+ -> every
    // smoothed count pair is equal -> each term and the total are 0.0 EXACTLY
    val vals = Seq(1.0, 45.0, 90.0, 130.0, 300.0)
    val rows = vals.flatMap(v => Seq(
      (Timestamp.valueOf("2024-01-03 00:00:00"), v),
      (Timestamp.valueOf("2024-01-20 00:00:00"), v)))
    rows.toDF("ts", "value").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StatsOps.psi(spark, dir).collect()
    assert(r.length === StatsOps.PsiBins.toInt) // literal spine: all 8 bins
    r.foreach { row =>
      assert(row.getDouble(5) === 0.0)
      assert(row.getDouble(6) === 0.0)
    }
    // period a all in bin 0, period b all in bin 7 -> strictly positive PSI
    val dir2 = tmp("psi2")
    val rows2 = (1 to 6).map(i =>
      (Timestamp.valueOf("2024-01-03 00:00:00"), 1.0 + i * 0.01)) ++
      (1 to 6).map(i => (Timestamp.valueOf("2024-01-20 00:00:00"), 310.0 + i))
    rows2.toDF("ts", "value").write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val r2 = StatsOps.psi(spark, dir2).collect()
    assert(r2.head.getDouble(6) > 0.5)
    // PSI terms are (p-q)ln(p/q): non-negative everywhere, strictly
    // positive exactly where mass moved
    val byBin = r2.map(row => row.getLong(0) -> row.getDouble(5)).toMap
    assert(byBin(0L) > 0.0 && byBin(7L) > 0.0)
    assert(byBin.values.forall(_ >= 0.0))
  }

  test("mutualInfo: exactly 0 under independence, ln 2 under identity") {
    import spark.implicits._
    val dir = tmp("mi")
    // 2x2 uniform: c_xy*N == c_x*c_y for every cell -> every pmi_q is the
    // quantized log of a ratio of EQUAL integers -> 0 exactly
    Seq(("a", "X"), ("a", "Y"), ("b", "X"), ("b", "Y"))
      .toDF("o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.mutualInfo(spark, dir).collect()
    assert(r.length === 4)
    r.foreach { row =>
      assert(row.getDouble(5) === 0.0)
      assert(row.getDouble(6) === 0.0)
    }
    // X == Y with two symbols: MI = ln 2 (up to the 2^-20 quantization)
    val dir2 = tmp("mi2")
    Seq(("a", "X"), ("a", "X"), ("b", "Y"), ("b", "Y"))
      .toDF("o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val r2 = StatsOps.mutualInfo(spark, dir2).collect()
    assert(r2.length === 2)
    val q = math.floor(math.log(8.0) * StatsOps.LogScale + 0.5).toLong -
      math.floor(math.log(4.0) * StatsOps.LogScale + 0.5).toLong
    val expMi = (4L * q).toDouble / (4.0 * StatsOps.LogScale)
    r2.foreach(row => assert(row.getDouble(6) === expMi))
    assert(math.abs(expMi - math.log(2.0)) < 1e-5)
  }

  test("cuped: y = 2x gives theta 2, var_reduction 1, equal adjusted means") {
    import spark.implicits._
    val dir = tmp("cuped")
    // per user: pre-period value v (day 3), post-period value 2v (day 20)
    val rows = (1 to 12).flatMap { u =>
      val v = u.toDouble
      Seq((u.toLong, Timestamp.valueOf("2024-01-03 00:00:00"), v),
        (u.toLong, Timestamp.valueOf("2024-01-20 00:00:00"), 2.0 * v))
    }
    rows.toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StatsOps.cuped(spark, dir).collect()
    assert(r.length === 2)
    assert(r.map(_.getString(0)).toSet === Set("control", "treatment"))
    val grandPre = (1 to 12).map(_ * 100L).sum.toDouble / 12.0
    r.foreach { row =>
      // covN = 2·varXN and covN² = varXN·varYN EXACTLY (all moments are
      // int-valued doubles < 2^53), so theta and var_reduction are exact
      assert(row.getDouble(5) === 2.0)
      assert(row.getDouble(6) === 1.0)
      // adjusted mean = 2·x̄ up to one rounding of the arm-mean subtraction
      assert(math.abs(row.getDouble(4) - 2.0 * grandPre) < 1e-9)
      // post = 2·pre exactly: (2a)/b ≡ 2·(a/b) in IEEE
      assert(row.getDouble(2) === 2.0 * row.getDouble(3))
    }
  }

  test("qqDeciles: doubled distribution reads ratio exactly 2 at every decile") {
    import spark.implicits._
    val dir = tmp("qq")
    val a = (1 to 10).map(i => (i.toLong, StatsOps.KsSourceA, i * 10L))
    val b = (11 to 20).map(i => (i.toLong, StatsOps.KsSourceB, (i - 10) * 20L))
    (a ++ b).toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = StatsOps.qqDeciles(spark, dir).collect()
    assert(r.length === 9)
    r.foreach { row =>
      val (qa, qb) = (row.getDouble(1), row.getDouble(2))
      assert(qb === 2.0 * qa)                   // scaling by 2 is exact
      assert(row.getDouble(3) === qb - qa)
      assert(row.getDouble(4) === 2.0)
    }
    // spot the 50th percentile: interpolated midpoint of 50 and 60
    assert(r.find(_.getInt(0) == 50).get.getDouble(1) === 55.0)
  }

  test("holt: hand-folded level/trend and forecasts on a linear ramp") {
    import spark.implicits._
    val dir = tmp("holt")
    // days 0..9, daily total (d+1)*100 cents; horizon 7 -> train days 0..2
    val rows = (0 until 10).map { d =>
      (Timestamp.valueOf(f"1995-01-${d + 1}%02d 00:00:00"), (d + 1) * 1.00)
    }
    rows.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // replica: seed (100, 0); x=200 -> (150, 25); x=300 -> (237.5, 56.25)
    var (l, t) = (100.0, 0.0)
    for (x <- Seq(200.0, 300.0)) {
      val lp = 0.5 * x + 0.5 * (l + t)
      val tp = 0.5 * (0.5 * x + 0.5 * (l + t) - l) + 0.5 * t
      l = lp; t = tp
    }
    assert((l, t) === ((237.5, 56.25)))
    val got = StatsOps.holt(spark, dir).collect()
    assert(got.length === 7)
    got.foreach { r =>
      val h = r.getInt(0)
      assert(r.getLong(1) === 2L + h)                    // day = cutoff + h
      assert(r.getLong(2) === (3 + h) * 100L)            // actual
      assert(r.getDouble(3) === l + h.toDouble * t)      // forecast, exact binary
      assert(r.getDouble(4) === math.abs((3 + h) * 100.0 - (l + h.toDouble * t)))
    }
  }

  test("bootstrapCi: degenerate corpus collapses the interval to the point") {
    import spark.implicits._
    val dir = tmp("boot")
    (1L to 10L).map(k => (k, 5.00)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.bootstrapCi(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((10L, StatsOps.BootReps)))
    assert(r.getDouble(2) === 500.0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 500.0 && r.getDouble(5) === 500.0)
    // heterogeneous corpus: positive SE, ordered bounds bracketing the point
    val dir2 = tmp("boot2")
    (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val r2 = StatsOps.bootstrapCi(spark, dir2).collect().head
    assert(r2.getDouble(3) > 0.0)
    assert(r2.getDouble(4) < r2.getDouble(2) && r2.getDouble(2) < r2.getDouble(5))
  }

  test("simpsons: both segments trend down, the pool trends up — reversal flagged") {
    import spark.implicits._
    val dir = tmp("simp")
    def d(x: Int) = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x))
    // segment A: (0, $1.00), (1, $0.00); segment B: (10, $2.00), (11, $1.00)
    // each slope exactly -100 cents/day; pooled = 3600/404 > 0
    Seq(("A", d(0), 1.00), ("A", d(1), 0.00), ("B", d(10), 2.00), ("B", d(11), 1.00))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsOps.simpsons(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got === Map(
      "A" -> ((2L, -100.0, 3600.0 / 404.0, true)),
      "B" -> ((2L, -100.0, 3600.0 / 404.0, true))))
  }

  test("stl: a linear series decomposes to trend-only — centering pinned exactly") {
    import spark.implicits._
    val dir = tmp("stl")
    // one order per day, totalprice = epoch-day dollars: the centered
    // 7-day mean of a LINEAR series is the center value exactly, so the
    // integer detrend is 0 everywhere -> seasonal and residual exactly 0.
    // An off-center window (the classic bug) would fail every row.
    val base = java.time.LocalDate.parse("1995-01-01")
    val rows = (0 until 14).map { i =>
      val d = base.plusDays(i)
      (java.sql.Date.valueOf(d), d.toEpochDay.toDouble)
    }
    rows.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsOps.stl(spark, dir).collect()
    assert(got.length === 8) // days 3..10 have full +/-3 windows
    for (r <- got) {
      val epoch = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) === epoch * 100)         // cents
      assert(r.getDouble(2) === epoch * 100.0)     // trend = center exactly
      assert(r.getDouble(3) === 0.0)               // seasonal
      assert(r.getDouble(4) === 0.0)               // residual
    }
  }

  test("cupedStratified: adaptive spend strata, per-stratum theta, null-theta coalesce") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = tmp("cupstrat")
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")   // day 10 <= 15
    val post = Timestamp.valueOf("2024-01-20 00:00:00")  // day 20 > 15
    // u1: x=0 (s0_zero), y=5; u2: x=10,y=10 and u4: x=5,y=0 (both below
    // the mean 45/4 by cross-multiplication -> s1_below); u3: x=30,y=20
    // (s2_above). theta(s1_below) over (10,10),(5,0): cov*n = 50,
    // varX*n = 25 -> 2.0, var_reduction = 1.0; singleton/zero-variance
    // strata get NULL theta and an UNadjusted mean
    Seq((1L, post, 1L, 0.05), (2L, pre, 2L, 0.10), (3L, post, 2L, 0.10),
      (4L, pre, 3L, 0.30), (5L, post, 3L, 0.20), (6L, pre, 4L, 0.05))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = StatsOps.cupedStratified(spark, dir).collect()
    val nByStratum = rows.groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(2)).sum }
    assert(nByStratum === Map("s0_zero" -> 1L, "s1_below" -> 2L, "s2_above" -> 1L))
    for (r <- rows) {
      val (stratum, theta) = (r.getString(0), Option(r.get(6)))
      if (stratum == "s1_below") {
        assert(theta.contains(2.0))
        assert(r.getDouble(7) === 1.0)
      } else {
        // zero-covariate / singleton stratum: theta NULL, adjustment zero
        assert(theta.isEmpty)
        assert(r.getDouble(5) === r.getDouble(3)) // adj_mean == mean_post
      }
    }
  }

  test("psiDaily: mirrored drift days score equal positive PSI; negatives clamp to bin 0") {
    import spark.implicits._
    val dir = tmp("psid")
    def ts(day: Int): Long = day * 86400L * 1000000000L // nanos-long
    // day 0: all mass in bin 0; day 1: all mass in bin 1 — symmetric
    // against the pooled baseline, so the two PSI points must be EQUAL
    // (and positive: quantized-log PSI terms are sign-aligned)
    val rows = Seq.fill(4)((ts(0), 1.0)) ++ Seq.fill(4)((ts(1), 50.0))
    rows.toDF("ts", "value").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StatsOps.psiDaily(spark, dir).collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 4L))
    assert(out(0).getDouble(2) === out(1).getDouble(2))
    assert(out(0).getDouble(2) > 0.0)
    // negative values land ON the spine (bin 0), not off it: pre-clamp
    // they fell out of both period totals entirely
    val dir2 = tmp("psid2")
    Seq((ts(0), -1.0), (ts(0), -0.01)).toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val out2 = StatsOps.psiDaily(spark, dir2).collect()
    assert(out2.length === 1)
    assert(out2.head.getLong(1) === 2L)
  }

  test("isotonic: matches the scalar minimax replica; monotone and mass-preserving") {
    val got = StatsOps.isotonic(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val bins = got.map(t => (t._2, t._3)) // (n, n_pos) in bin order
    // independent scalar replica of iso(i) = max_{j<=i} min_{k>=i} mean(j..k)
    def mean(j: Int, k: Int): Double = {
      val sp = (j to k).map(bins(_)._2).sum.toDouble
      val sn = (j to k).map(bins(_)._1).sum.toDouble
      sp / sn
    }
    val m = bins.indices.toArray
    val expect = m.map(i => (0 to i).map(j => (i until bins.length).map(k =>
      mean(j, k)).min).max)
    assert(got.map(_._5).toSeq === expect.toSeq)
    // monotone non-decreasing, and PAV preserves the positive mass
    assert(got.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    val mass = got.map(t => t._2 * t._5).sum
    val pos = got.map(_._3).sum.toDouble
    assert(math.abs(mass - pos) / pos < 1e-9)
    // the fit is non-vacuous on this corpus: some raw rate was reordered
    assert(got.map(_._4).toSeq != got.map(_._5).toSeq)
  }

  test("elasticity: two-point log-log fit matches the scalar replica; slope ~1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-elas").toString
    // doubling price doubles quantity here, so the log-log slope is ~1
    // (exactly the quantized-log ratio the replica computes)
    Seq((1L, BigDecimal("1.00"), 1L), (1L, BigDecimal("2.00"), 2L))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "B1")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    def lnq(m: Long): Long =
      math.floor(math.log(m.toDouble) * (1L << 20) + 0.5).toLong
    val (x1, y1) = (lnq(100), lnq(1)); val (x2, y2) = (lnq(200), lnq(2))
    val (n, sx, sy) = (2.0, (x1 + x2).toDouble, (y1 + y2).toDouble)
    val sxy = (x1 * y1 + x2 * y2).toDouble; val sxx = (x1 * x1 + x2 * x2).toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n / (1L << 20).toDouble
    val got = StatsOps.elasticity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("B1", 2L, slope, intercept)))
    assert(math.abs(slope - 1.0) < 1e-6)
  }

  test("looInfluence: removing a segment moves the pooled slope by hand-computed deltas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-loo").toString
    // A rises (0,0)->(1,100 cents), B falls (0,200)->(1,0).
    // pooled slope = (4·100 − 2·300)/(4·2 − 4) = −50; without A the slope
    // is B's own −200 (influence +150); without B it is A's +100 (−150)
    Seq(
      ("A", "1970-01-01", BigDecimal("0.00")), ("A", "1970-01-02", BigDecimal("1.00")),
      ("B", "1970-01-01", BigDecimal("2.00")), ("B", "1970-01-02", BigDecimal("0.00")))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsOps.looInfluence(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("A", 2L, -50.0, -200.0, 150.0),
      ("B", 2L, -50.0, 100.0, -150.0)))
  }

  test("gmmHard: recovers a planted bimodal price split exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gmm").toString
    // two tight clusters around $10 and $500: the midpoint init already
    // separates them and EM rounds keep the split stable, so means and
    // sds are hand-computable from the exact cents moments
    Seq(9.0, 10.0, 11.0, 499.0, 500.0, 501.0).zipWithIndex
      .map { case (p, i) => (i.toLong, BigDecimal(p)) }
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsOps.gmmHard(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val sd = math.sqrt(60000.0 / 3.0 / 3.0) / 100.0 // m = 3·Σx² − s² = 60000 cents²
    assert(got.toSeq === Seq(
      (1, 3L, 0.5, 10.0, sd),
      (2, 3L, 0.5, 500.0, sd)))
  }

  test("cemAtt: hand-built strata, group means, and the weighted ATT") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cem").toString
    // 4 users. clicks: u1,u2 = 2, u3,u4 = 0 (mean cut -> strata 4 vs 0);
    // views = 1 each and signups = 0 (cuts never fire); errors: u1,u3 = 2,
    // u2,u4 = 0 (treatment). Purchases: 10.00 / 6.00 / 3.00 / 1.00.
    // Stratum 4: diff = 10 - 6 = 4; stratum 0: diff = 3 - 1 = 2;
    // ATT = (1*4 + 1*2) / 2 = 3.
    val t0 = 86400L * 1000000000L
    def ev(u: Long, tpe: String, n: Int, v: Double = 0.0) =
      Seq.fill(n)((t0, u, tpe, v))
    val rows =
      ev(1, "click", 2) ++ ev(2, "click", 2) ++
      (1L to 4L).flatMap(u => ev(u, "view", 1)) ++
      ev(1, "error", 2) ++ ev(3, "error", 2) ++
      ev(1, "purchase", 1, 10.0) ++ ev(2, "purchase", 1, 6.0) ++
      ev(3, "purchase", 1, 3.0) ++ ev(4, "purchase", 1, 1.0)
    rows.toDF("ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsOps.cemAtt(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      (0, 1L, 1L, 3.0, 1.0, 2.0, 3.0),
      (4, 1L, 1L, 10.0, 6.0, 4.0, 3.0)))
  }

  test("midranks2: doubled midranks across the bucket boundary") {
    import spark.implicits._
    // 65535 falls in bucket 0, 65536/65537 in bucket 1 — the cross-bucket
    // offset path must carry bucket 0's total into bucket 1's ranks
    val pv = Seq((65535L, 1L), (65536L, 2L), (65537L, 1L)).toDF("v", "c")
    val got = StatsOps.midranks2(pv).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // rank2 = 2*F_excl + c + 1: 65535 -> 2 (rank 1); 65536 -> 2+2+1 = 5
    // (midrank 2.5); 65537 -> 6+1+1 = 8 (rank 4)
    assert(got === Map(65535L -> 2L, 65536L -> 5L, 65537L -> 8L))
  }

  test("spearman: monotone cube is +1, reversal is -1, ties midranked") {
    import spark.implicits._
    val dir = tmp("spear")
    // quantity 1,2,2,3 (tie at 2); extendedprice = quantity^3 (monotone,
    // nonlinear -> Pearson < 1 but Spearman exactly 1); discount ranks are
    // the exact reversal (4, 2.5, 2.5, 1)
    Seq((1.0, 1.0, 0.08), (2.0, 8.0, 0.01), (2.0, 8.0, 0.01), (3.0, 27.0, 0.00))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = StatsOps.spearman(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(rows(("extendedprice", "quantity")) === 1.0)
    assert(rows(("discount", "quantity")) === -1.0)
    assert(rows(("discount", "extendedprice")) === -1.0)
    assert(rows.size === 3)
  }

  test("kruskal: hand-computed H and tie correction") {
    import spark.implicits._
    val dir = tmp("kw")
    // groups A: {1, 2}, B: {2, 3}; combined midranks 1, 2.5, 2.5, 4 so
    // R_A = 3.5, R_B = 6.5; H = 12/(4*5)*(3.5^2/2 + 6.5^2/2) - 3*5 = 1.35;
    // one tie of size 2 -> C = 1 - 6/60 = 0.9; H/C = 1.5
    Seq(("A", 1.00), ("A", 2.00), ("B", 2.00), ("B", 3.00))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.kruskal(spark, dir).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 1.35) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.9) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.5) < 1e-12)
  }

  test("xcorr: a series shifted by exactly two days peaks at lag 2") {
    import spark.implicits._
    val dir = tmp("xc")
    def ts(day: Int): Long = // nanos-long fixture, days from 2024-01-01
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L
        + day * 86400L) * 1000000000L
    val pattern = Seq(1, 3, 1, 3)
    val rows =
      pattern.zipWithIndex.flatMap { case (n, d) => Seq.fill(n)((ts(d), "view")) } ++
      pattern.zipWithIndex.flatMap { case (n, d) => Seq.fill(n)((ts(d + 2), "purchase")) }
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = StatsOps.xcorr(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(m(2L) === ((4L, Some(1.0))))   // full overlap, identical pattern
    assert(m(0L) === ((2L, Some(1.0))))   // days 2,3 overlap: (1,3) vs (1,3)
    assert(m(1L) === ((3L, Some(-1.0))))  // (1,3,1) vs (3,1,3)
    // only lags with >= 1 overlapping day emit a row: -1..5 here
    assert(m.keySet === (-1L to 5L).toSet)
  }

  test("holtWinters: scalar fold replica, seed conventions, slot routing") {
    import spark.implicits._
    val dir = tmp("hw")
    val prices = Seq(10.0, 20.0, 15.0, 12.0, 11.0, 13.0, 14.0, 16.0, 18.0, 17.0)
    prices.zipWithIndex.map { case (p, d) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, d + 1)), p)
    }.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // scalar replica of the 10-slot fold: cutoff = 9 - 7 = 2, fit days 0..2
    var (lvl, tr) = (prices(0) * 100, 0.0)
    val s = Array.fill(7)(0.0)
    for (d <- 1 to 2) {
      val x = prices(d) * 100
      val sold = s(d % 7)
      val lvlP = 0.5 * (x - sold) + 0.5 * (lvl + tr)
      val trP = 0.5 * (lvlP - lvl) + 0.5 * tr
      s(d % 7) = 0.5 * (x - lvlP) + 0.5 * sold
      lvl = lvlP; tr = trP
    }
    val got = StatsOps.holtWinters(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    for (h <- 1 to 7) {
      val exp = lvl + h * tr + s((2 + h) % 7)
      assert(got(h) === (((prices(2 + h) * 100).toLong, exp)), s"h=$h")
    }
  }

  test("stump: finds the perfect split on both features, min-v tiebreak") {
    import spark.implicits._
    val dir = tmp("stump")
    // positives cheap and early, negatives dear and late: the perfect
    // split is totalprice <= 2.00 (threshold 200 cents) / day <= 0
    Seq(("1-URGENT", 1.00, "1995-01-01"), ("1-URGENT", 2.00, "1995-01-01"),
        ("5-LOW", 3.00, "1995-01-02"), ("5-LOW", 4.00, "1995-01-02"))
      .map { case (p, t, d) => (p, t, java.sql.Date.valueOf(d)) }
      .toDF("o_orderpriority", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsOps.stump(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // perfect split: gain = gini(parent) = 1 - 2*(1/2)^2 = 0.5
    assert(got("totalprice_cents") === ((4L, 2L, 200L, 0.5)))
    assert(got("order_day") === ((4L, 2L, 0L, 0.5)))
  }

  test("friedman: hand-computed blocked ranks, tie and incomplete block") {
    import spark.implicits._
    val dir = tmp("fried")
    def ts(day: Int): Long = day * 86400L * 1000000000L
    val rows =
      Seq.fill(1)((ts(0), "a")) ++ Seq.fill(2)((ts(0), "b")) ++  // ranks a<b
      Seq.fill(1)((ts(1), "a")) ++ Seq.fill(3)((ts(1), "b")) ++  // ranks a<b
      Seq.fill(2)((ts(2), "a")) ++ Seq.fill(2)((ts(2), "b")) ++  // tied
      Seq.fill(5)((ts(3), "a"))                                   // incomplete
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StatsOps.friedman(spark, dir).collect()(0)
    // R2_a = 2+2+3 = 7, R2_b = 4+4+3 = 11; S = (49+121)/4 = 42.5
    val s = (7.0 * 7.0 / 4.0) + (11.0 * 11.0 / 4.0)
    val chi2 = 12.0 * s / (3.0 * 2.0 * (2.0 + 1.0)) - 3.0 * 3.0 * (2.0 + 1.0)
    val tieC = 1.0 - 6.0 / (3.0 * 2.0 * (2.0 * 2.0 - 1.0))
    assert(r.getLong(0) === 2L)   // k: the day-3 block is dropped
    assert(r.getLong(1) === 3L)   // n complete blocks
    assert(r.getDouble(2) === chi2)
    assert(r.getDouble(3) === tieC)
    assert(r.getDouble(4) === chi2 / tieC)
  }

  test("theilsen: median of the three pairwise slopes") {
    import spark.implicits._
    val dir = tmp("tsen")
    Seq((1L, "X")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // months 0,1,2 with revenue 1.00, 2.00, 4.00 dollars: slopes in cents
    // per month are 100, 150, 200 -> median 150
    Seq(("1995-01-15", 1.00), ("1995-02-15", 2.00), ("1995-03-15", 4.00))
      .map { case (d, p) => (1L, java.sql.Date.valueOf(d), p) }
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = StatsOps.theilsen(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "X")
    assert(r(0).getLong(1) === 3L)
    assert(r(0).getLong(2) === 3L)
    assert(r(0).getDouble(3) === 150.0)
  }
}

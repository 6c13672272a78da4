package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral-analytics fixtures: strict funnel ordering (ties and
  * out-of-order stages must NOT convert), cohort arithmetic, and the
  * absent-cell case in the drift grid — the paths the generated corpus
  * cannot be relied on to exercise.
  */
class BehaviorOpsSpec extends SparkSpec {

  /** Nanos-long ts at minute `m` of epoch day `d`. */
  private def ts(d: Int, m: Int): Long = (d * 86400L + m * 60L) * 1000000000L

  test("funnel: strict ordering, ties and reversed stages do not convert") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    Seq(
      // user 1: full conversion, 1 min then 2 min
      (1L, ts(0, 0), 1L, "signup"), (2L, ts(0, 1), 1L, "click"),
      (3L, ts(0, 3), 1L, "purchase"),
      // user 2: click at the SAME micro as signup -> stalls at stage 1
      (4L, ts(0, 0), 2L, "signup"), (5L, ts(0, 0), 2L, "click"),
      // user 3: click BEFORE signup, purchase after -> purchase without
      // a qualifying click cannot convert either
      (6L, ts(0, 5), 3L, "signup"), (7L, ts(0, 4), 3L, "click"),
      (8L, ts(0, 6), 3L, "purchase"),
      // user 4: click but never signed up -> not in the funnel at all
      (9L, ts(0, 0), 4L, "click"),
      // user 5: converts to click in 3 min; two clicks, earliest wins
      (10L, ts(0, 0), 5L, "signup"), (11L, ts(0, 3), 5L, "click"),
      (12L, ts(0, 9), 5L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = BehaviorOps.funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), Option(r.get(3))))).toMap
    assert(rows(1) === ((4L, None)))                    // users 1,2,3,5 signed up
    assert(rows(2)._1 === 2L)                           // users 1 and 5
    assert(rows(2)._2 === Some((60e6 + 180e6) / 2))     // mean of 1 and 3 min
    assert(rows(3) === ((1L, Some(120e6))))             // user 1 only, 2 min
  }

  test("itemCf: quantized cosine ordering from hand-drawn baskets") {
    import spark.implicits._
    // items 10 and 20 each in 4 baskets, 30 in 2; co(10,20)=3, co(10,30)=1
    // cos(10,20) = 3/sqrt(16) = 0.75 beats cos(10,30) = 1/sqrt(8) ~ 0.354
    val raw = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 30L),
      (5L, 30L), (5L, 20L))
      .toDF("ok", "pk")
    val rows = BehaviorOps.itemCfFrom(raw).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    def cosQ(co: Long, na: Long, nb: Long): Long =
      math.floor(co * BehaviorOps.CfScale
        / math.sqrt((na * nb).toDouble) + 0.5).toLong
    assert(rows((10L, 1)) === ((20L, 3L, cosQ(3, 4, 4))))
    assert(rows((10L, 2)) === ((30L, 1L, cosQ(1, 4, 2))))
    assert(rows((20L, 1)) === ((10L, 3L, cosQ(3, 4, 4))))
    // every item has at most CfNeighbors ranked rows
    assert(rows.keySet.forall(_._2 <= BehaviorOps.CfNeighbors))
  }

  test("attribution: last touch wins, lookback expires, encoding breaks ties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    Seq(
      // user 1: click 2 days before purchase -> click
      (1L, ts(0, 0), 1L, "click", null.asInstanceOf[java.lang.Double]),
      (2L, ts(2, 0), 1L, "purchase", java.lang.Double.valueOf(10.0)),
      // user 2: view 10 days before purchase -> lookback expired, none
      (3L, ts(0, 0), 2L, "view", null.asInstanceOf[java.lang.Double]),
      (4L, ts(10, 0), 2L, "purchase", java.lang.Double.valueOf(5.5)),
      // user 3: naked purchase -> none
      (5L, ts(1, 0), 3L, "purchase", java.lang.Double.valueOf(2.0)),
      // user 4: click then view then purchase -> the LAST touch (view)
      (6L, ts(0, 0), 4L, "click", null.asInstanceOf[java.lang.Double]),
      (7L, ts(0, 5), 4L, "view", null.asInstanceOf[java.lang.Double]),
      (8L, ts(0, 9), 4L, "purchase", java.lang.Double.valueOf(1.0)),
      // user 5: signup at the SAME ts as the purchase, earlier event_id:
      // the rank encoding must still see it as preceding
      (9L, ts(3, 0), 5L, "signup", null.asInstanceOf[java.lang.Double]),
      (10L, ts(3, 0), 5L, "purchase", java.lang.Double.valueOf(4.25)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = BehaviorOps.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows === Map(
      "click" -> ((1L, 1000L)),
      "none" -> ((2L, 750L)),
      "view" -> ((1L, 100L)),
      "signup" -> ((1L, 425L))))
  }

  test("retention: cohort week and offsets from hand-placed activity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toString
    Seq(
      // epoch week 0 = days 0..6; user 1 active weeks 0 and 2
      (1L, ts(0, 0), 1L, "click"), (2L, ts(15, 0), 1L, "view"),
      // user 2 first seen week 2, active weeks 2 and 3
      (3L, ts(14, 0), 2L, "click"), (4L, ts(21, 0), 2L, "view"),
      // user 3 only week 0
      (5L, ts(3, 0), 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = BehaviorOps.retention(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows === Map(
      (0, 0) -> 2L, // users 1 and 3 in cohort 0, week 0
      (0, 2) -> 1L, // user 1 returns two weeks later
      (2, 0) -> 1L, // user 2's own cohort
      (2, 1) -> 1L))
  }

  test("streaks: islands, multiple same-day events, and singleton runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-streak").toString
    Seq(
      // user 1: days 1,2,3 then 10,11 -> streaks of 3 and 2
      (1L, ts(1, 0), 1L, "click"), (2L, ts(2, 0), 1L, "view"),
      (3L, ts(2, 5), 1L, "view"), // second event same day: no double-count
      (4L, ts(3, 0), 1L, "click"),
      (5L, ts(10, 0), 1L, "click"), (6L, ts(11, 0), 1L, "click"),
      // user 2: isolated days 5 and 7 -> two singleton streaks
      (7L, ts(5, 0), 2L, "click"), (8L, ts(7, 0), 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = BehaviorOps.streaks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) === ((2L, 3L, 5L)))
    assert(rows(2L) === ((2L, 1L, 2L)))
  }

  test("drift: a day missing a type entirely still pays that type's share") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // day 0: 3 click + 1 view; day 1: 4 click only (view absent)
    // baseline: click 7/8, view 1/8
    val evs =
      (1L to 3L).map(i => (i, ts(0, i.toInt), i, "click", 0.0)) ++
        Seq((4L, ts(0, 9), 4L, "view", 0.0)) ++
        (5L to 8L).map(i => (i, ts(1, i.toInt), i, "click", 0.0))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = BehaviorOps.driftLinf(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toSeq
    // day 0: |3/4 - 7/8| = 1/8, |1/4 - 1/8| = 1/8 -> 0.125
    // day 1: |4/4 - 7/8| = 1/8, |0 - 1/8| = 1/8 -> 0.125 (needs the grid:
    // without the absent view cell the max would still be 1/8 here, but
    // the o=0 term is what carries it when the missing type dominates)
    assert(rows === Seq(4L -> 0.125, 4L -> 0.125))
  }

  test("drift: absent dominant type is reported at full baseline share") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift2").toString
    // baseline: view 9/10; day 1 has NO view at all -> drift must be 0.9-ish
    val evs =
      (1L to 9L).map(i => (i, ts(0, i.toInt), i, "view", 0.0)) ++
        Seq((10L, ts(1, 1), 1L, "click", 0.0))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val byDay = BehaviorOps.driftLinf(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(byDay(1L) === 0.9) // |0 - 9/10| from the absent-view grid cell
  }

  test("ab test: z recomputed from the exact counts, arms partition the log") {
    val sf = "/root/testdata/sf0.001"
    val r = BehaviorOps.abTest(spark, sf).collect()(0)
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb === graft.Tables.events(spark, sf).count())
    assert(ca <= na && cb <= nb && na > 0 && nb > 0)
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pPool = (ca.toDouble + cb.toDouble) / (na.toDouble + nb.toDouble)
    val z = (pa - pb) / math.sqrt(pPool * (1.0 - pPool) * (1.0 / na + 1.0 / nb))
    assert(r.getDouble(4) === pa && r.getDouble(5) === pb)
    assert(r.getDouble(6) === z) // bit-exact: same IEEE ops, same order
    assert(r.getBoolean(7) === (math.abs(z) > 1.96))
  }

  test("ewma: driver-side left fold reproduces the engine bit-exactly") {
    val sf = "/root/testdata/sf0.001"
    val rows = BehaviorOps.ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val u = rows(0).getLong(0)
    val vals = graft.Tables.events(spark, sf)
      .filter(col("user_id") === u && col("value").isNotNull)
      .select(col("ts"), col("event_id"), col("value")).collect()
      .map(r => (r.getTimestamp(0).getTime * 1000 + r.getTimestamp(0).getNanos / 1000 % 1000,
        r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).map(_._3)
    val want = vals.tail.foldLeft(vals.head)((acc, x) => 0.25 * x + 0.75 * acc)
    assert(byUser(u)._1 === vals.length.toLong)
    assert(byUser(u)._2 === want) // identical IEEE op chain
  }

  test("chisq: statistic recomputed from the contingency table, df = 4") {
    val sf = "/root/testdata/sf0.001"
    val r = BehaviorOps.chisq(spark, sf).collect()(0)
    val cells = graft.Tables.events(spark, sf)
      .select((col("user_id") % 2).as("arm"), col("event_type")).collect()
      .map(x => (x.getLong(0), x.getString(1)))
      .groupBy(x => x).view.mapValues(_.length.toLong).toMap
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    // fold in the SAME (arm, type) order the op pins
    val terms = cells.toSeq.sortBy(_._1).map { case ((a, t), o) =>
      val e = rowT(a).toDouble * colT(t).toDouble / n.toDouble
      (o.toDouble - e) * (o.toDouble - e) / e
    }
    val chisq = terms.tail.foldLeft(terms.head)(_ + _)
    assert(r.getLong(0) === n && r.getLong(1) === cells.size.toLong)
    assert(r.getDouble(2) === chisq) // identical fold order → bit-exact
    assert(r.getLong(3) === 4L)
    assert(r.getBoolean(4) === (chisq > 9.487729036781154))
  }

  test("session paths: full driver-side sessionize + path replay matches") {
    val sf = "/root/testdata/sf0.001"
    val got = BehaviorOps.sessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gapUs = graft.streaming.Sessionize.GapMs * 1000L
    val paths = events.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer[List[String]]()
      var lastUs = Long.MinValue
      for ((_, _, us, tpe) <- ordered) {
        if (lastUs == Long.MinValue || us - lastUs > gapUs)
          sessions += List(tpe)
        else if (sessions.last.length < 3)
          sessions(sessions.length - 1) = sessions.last :+ tpe
        else () // step > 3: session already has its prefix
        lastUs = us
      }
      sessions.map(p => (user, p.mkString(">")))
    }
    val want = paths.groupBy(_._2).map { case (p, rows) =>
      (p, rows.length.toLong, rows.map(_._1).distinct.length.toLong)
    }.toSeq.sortBy(t => (-t._2, t._1)).take(15)
    assert(got.toSeq === want)
  }

  test("rolling dau: window recount per active day matches the explode form") {
    val sf = "/root/testdata/sf0.001"
    val got = BehaviorOps.rollingDau(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val du = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("d"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val want = du.map(_._1).distinct.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      .map { d =>
        val win = du.filter { case (day, _) =>
          !day.isAfter(d) && !day.isBefore(d.minusDays(6)) }
        (d, win.filter(_._1 == d).map(_._2).distinct.length.toLong,
          win.map(_._2).distinct.length.toLong)
      }
    assert(got.toSeq === want.toSeq)
    // the 7-day window can only see MORE distinct users than one day
    assert(got.forall(r => r._3 >= r._2))
  }

  test("basket pairs: mega-basket dropped whole, singleton ignored, lift exact") {
    import spark.implicits._
    // baskets: two identical {1,2}; one 13-item (over the 12 cap, dropped
    // WHOLE -> parts 100.. contribute nothing); one singleton (no pairs)
    val lp = (Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 5L)) ++
      (0 until 13).map(i => (40L, 100L + i))).toDF("ok", "pk")
    val rows = BehaviorOps.basketPairsFrom(lp).collect()
    assert(rows.length === 1)
    val r = rows(0)
    // pair (1,2) in both kept baskets; n_baskets=2 (mega + singleton out)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 2L, 2L)))
    assert((r.getLong(3), r.getLong(4)) === ((2L, 2L)))
    assert(r.getDouble(5) === 1.0) // lift = 2*2/(2*2)
  }

  test("rfm grid: partitions the customer base, scores rank the value mass") {
    val sf = "/root/testdata/sf0.001"
    val rows = BehaviorOps.rfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nCust = graft.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._4).sum === nCust)          // every customer in ONE cell
    assert(rows.forall(r => Seq(r._1, r._2, r._3).forall(s => s >= 1 && s <= 4)))
    // monetary quartiles actually rank money: mean cents strictly rises
    // from the bottom to the top m_score band
    val byM = rows.groupBy(_._3).map { case (m, cs) =>
      m -> cs.map(_._5).sum.toDouble / cs.map(_._4).sum }
    assert(byM(4L) > byM(1L))
  }

  test("audience overlap matches an in-memory Jaccard at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val tu = graft.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = tu.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val got = BehaviorOps.audienceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size if inter > 0
    } {
      val (na, nb, nBoth, j) = got((a, b))
      assert((na, nb, nBoth) === ((sets(a).size.toLong, sets(b).size.toLong, inter.toLong)))
      assert(j === inter.toDouble / (sets(a).size + sets(b).size - inter))
    }
  }

  test("degree profile: histogram mass equals the distinct edge count on both sides") {
    val sf = "/root/testdata/sf0.001"
    val rows = GraphOps.degreeProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nEdges = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    for (kind <- Seq("customer", "supplier")) {
      val mass = rows.filter(_._1 == kind).map(r => r._2 * r._3).sum
      assert(mass === nEdges, kind) // Σ deg·n_nodes = |edges|, each side
    }
  }

  test("markov transitions: rows are probability distributions, counts exact") {
    val sf = "/root/testdata/sf0.001"
    val rows = BehaviorOps.markovNext(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cur, cs) =>
      assert(math.abs(cs.map(_._4).sum - 1.0) < 1e-9, cur)
    }
    // exact recount of one cell from the raw per-user sequences
    val seqs = graft.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values
      .flatMap(_.sortBy(e => (e._2.getTime, e._3)).map(_._4).sliding(2).toSeq
        .collect { case Array(a, b) => (a, b) })
      .toSeq
    val want = seqs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === want)
  }

  test("survival curve matches an in-memory Kaplan-Meier at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val pc = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("f"), max(to_date(col("o_orderdate"))).as("l"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val hz = pc.map(_._2).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val lives = pc.map { case (f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l) / 7,
        java.time.temporal.ChronoUnit.DAYS.between(l, hz) < BehaviorOps.SurvCensorDays)
    }
    val deathWeeks = lives.filter(!_._2).groupBy(_._1).map { case (w, xs) => w -> xs.size }
    var surv = 1.0
    val want = deathWeeks.keys.toSeq.sorted.map { w =>
      val r = lives.count(_._1 >= w)
      surv *= 1.0 - deathWeeks(w).toDouble / r
      (w, deathWeeks(w).toLong, r.toLong, surv)
    }
    val got = BehaviorOps.survival(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === want)
    // survival is a proper non-increasing curve in (0, 1]
    assert(got.map(_._4).sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
  }

  test("cohort ltv: triangle accounts for every cent; curves are non-decreasing") {
    val sf = "/root/testdata/sf0.001"
    val rows = BehaviorOps.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalCents = graft.Tables.orders(spark, sf)
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")))
      .head.getLong(0)
    assert(rows.map(_._4).sum === totalCents) // no revenue lost or doubled
    rows.groupBy(_._1).values.foreach { cs =>
      val sorted = cs.sortBy(_._2)
      // cum_cents is the running sum of rev_cents in offset order
      assert(sorted.map(_._4).scanLeft(0L)(_ + _).tail.toSeq === sorted.map(_._5).toSeq)
      // offset 0 always exists: the acquisition order itself is revenue
      assert(sorted.head._2 === 0L)
    }
  }

  test("seasonal anomaly grid: Chebyshev bound holds in every cell") {
    val rows = BehaviorOps.seasonalAnomaly(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty && rows.length <= 168) // at most 7x24 cells
    rows.foreach { r =>
      val (n, anom) = (r.getLong(2), r.getLong(5))
      // P(|v - mean| > 3σ) <= 1/9 for ANY distribution — a flag count
      // past n/9 would mean the mean/σ arithmetic is broken
      assert(9 * anom <= n, s"cell (${r.getLong(0)},${r.getLong(1)})")
      assert(r.getDouble(4) >= 0.0) // σ from exact moments: never negative
    }
  }

  test("time-weighted average integrates the step function, excludes the last hold") {
    import spark.implicits._
    def ts(s: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(s)}")
    // v=10 held 10s, v=0 held 30s, final reading open-ended (excluded)
    val e = Seq(
      (1L, ts(0), 1L, 10.0), (1L, ts(10), 2L, 0.0), (1L, ts(40), 3L, 99.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = BehaviorOps.timeWeightedFrom(e).collect()(0)
    assert(r.getLong(1) === 2L)            // two closed spans
    assert(r.getLong(2) === 40L)           // 10 + 30 seconds
    assert(r.getDouble(3) === 2.5)         // (10*10 + 0*30) / 40
  }

  test("interarrival: gaps to the previous same-user event, typed by the later one") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-iat").toString
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
    Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(10)), (1L, 3L, "click", ts(30)),
      (2L, 4L, "view", ts(0)), (2L, 5L, "view", ts(100)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = BehaviorOps.interarrival(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // click gaps: 10 s (u1 t10-t0) and 20 s (u1 t30-t10)
    assert(got("click") === ((2L, 15.0, 15.0, 19.0)))
    // view gaps: only u2's 100 s (first events have no predecessor)
    assert(got("view") === ((1L, 100.0, 100.0, 100.0)))
  }

  test("churn: retained/churned/new partition the user base exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-churn").toString
    val a = Timestamp.valueOf("2024-01-05 00:00:00")
    val b = Timestamp.valueOf("2024-01-25 00:00:00")
    Seq((1L, a), (1L, b), (2L, a), (3L, b), (4L, a))
      .toDF("user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = BehaviorOps.churn(spark, dir).collect().head
    assert(r.getLong(0) === 3L)          // first half: u1, u2, u4
    assert(r.getLong(1) === 2L)          // second half: u1, u3
    assert(r.getLong(2) === 1L)          // retained: u1
    assert(r.getLong(3) === 2L)          // churned: u2, u4
    assert(r.getLong(4) === 1L)          // new: u3
    assert(r.getDouble(5) === 2.0 / 3.0)
  }

  test("funnelTime: pre-signup purchases never convert; exact latency deciles") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-ftime").toString
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
    val rows = Seq(
      (1L, "signup", ts(0)), (1L, "purchase", ts(10)), (1L, "purchase", ts(20)),
      (2L, "purchase", ts(5)), (2L, "signup", ts(30)),   // purchase BEFORE signup
      (3L, "signup", ts(0)),                             // never purchases
      (4L, "signup", ts(0)), (4L, "purchase", ts(30)),
      (9L, "purchase", ts(1)))                           // purchase, no signup
    rows.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = BehaviorOps.funnelTime(spark, dir).collect().head
    assert(r.getLong(0) === 4L)        // signups: u1..u4
    assert(r.getLong(1) === 2L)        // converted: u1 (10s), u4 (30s)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 20.0)    // median of {10, 30}
    assert(r.getDouble(4) === 28.0)    // p90 interpolation 10 + 0.9*20
  }

  test("markovEval: last-hop holdout, argmax prediction, unseen-state miss") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mkv").toString
    def t(m: Int): Long = m * 60000000000L
    // u1: a b a b a b -> train ab x2, ba x2; holdout (a,b) -> pred(a)=b HIT
    // u2: b c b c     -> train bc, cb;       holdout (b,c) -> pred(b)=a MISS
    //    (b's train counts: ba 2 vs bc 1 -> argmax a)
    val e1 = Seq("a", "b", "a", "b", "a", "b").zipWithIndex.map {
      case (ty, i) => (i.toLong, t(i), 1L, ty) }
    val e2 = Seq("b", "c", "b", "c").zipWithIndex.map {
      case (ty, i) => (100L + i, t(i), 2L, ty) }
    (e1 ++ e2).toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = BehaviorOps.markovEval(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map("a" -> ((1L, 1L, 1.0)), "b" -> ((1L, 0L, 0.0))))
  }

  test("cfEval: hit via trained neighbor, applicable-only denominator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cfeval").toString
    // train (even ok): {1,2} x2 and {1,3} -> CF(1) = {2,3}, CF(2) = {1}...
    // test (odd ok): {1,2} hold 2 -> HIT; {1,9} hold 9 -> applicable miss;
    // {7,8} hold 8 -> context 7 unmodeled -> not applicable
    val rows = Seq(
      (0L, 1L), (0L, 2L), (2L, 1L), (2L, 2L), (4L, 1L), (4L, 3L),
      (1L, 1L), (1L, 2L), (3L, 1L), (3L, 9L), (5L, 7L), (5L, 8L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = BehaviorOps.cfEval(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      === ((3L, 2L, 1L, 0.5)))
  }

  test("firstTouch: earliest in-window touch wins; aged-out lookback is none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ftouch").toString
    def d(day: Int): Long = day * 86400L * 1000000000L // nanos-long
    Seq(
      // user 1: click d0, view d1, purchase d2 — FIRST touch is the click
      // (last-touch attribution would credit the view); second purchase at
      // d20 has no touch inside the 7-day window -> none
      (1L, d(0), 1L, "click", 0.0), (2L, d(1), 1L, "view", 0.0),
      (3L, d(2), 1L, "purchase", 10.0), (4L, d(20), 1L, "purchase", 5.0),
      // user 2: view d0, purchase d8 (view aged out -> none); then signup
      // d9, purchase d10 -> signup, though the view is GLOBALLY earliest —
      // the window-expiry case a running min cannot express
      (5L, d(0), 2L, "view", 0.0), (6L, d(8), 2L, "purchase", 3.0),
      (7L, d(9), 2L, "signup", 0.0), (8L, d(10), 2L, "purchase", 2.0),
      // user 3: touch exactly 7 days before the purchase — the RANGE
      // frame's preceding bound is inclusive
      (9L, d(0), 3L, "click", 0.0), (10L, d(7), 3L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = BehaviorOps.firstTouch(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m === Map(
      "click"  -> ((2L, 1100L)),
      "signup" -> ((1L, 200L)),
      "none"   -> ((2L, 800L))))
  }

  test("markovRemoval: hand-iterated removal effects on a 2-channel chain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrem").toString
    // counts: START->{click:2, view:2}; click->{CONV:2, NULL:1};
    // view->{CONV:1, click:1}. Quantized at S=2^20 and value-iterated by
    // hand (stable from round 3): v(click)=699050, v(view)=873813,
    // v(START)=786431; remove click -> 262144; remove view -> 349525.
    Seq(
      (1L, ts(0, 0), 1L, "click"), (2L, ts(0, 1), 1L, "purchase"),
      (3L, ts(0, 0), 2L, "view"), (4L, ts(0, 1), 2L, "purchase"),
      (5L, ts(0, 0), 3L, "click"),
      (6L, ts(0, 0), 4L, "view"), (7L, ts(0, 1), 4L, "click"),
      (8L, ts(0, 2), 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = BehaviorOps.markovRemoval(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m("click") === ((786431L, 262144L,
      524287.0 / 786431.0, 524287.0 / 961193.0)))
    assert(m("view") === ((786431L, 349525L,
      436906.0 / 786431.0, 436906.0 / 961193.0)))
  }

  test("markovRemoval: a purchase closes its journey — the next event re-STARTs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrem2").toString
    // one user, purchase THEN click: with the split, journeys are
    // [CONV] and [click->NULL], so START->{CONV:1, click:1} and
    // v(START) = (S/2 · S) div S = 524288 — exactly the 1-in-2-journeys
    // conversion probability. An unsplit timeline would give
    // START->{CONV:1} only and v(START) = S = 1048576.
    Seq(
      (1L, ts(0, 0), 1L, "purchase"), (2L, ts(0, 1), 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = BehaviorOps.markovRemoval(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "click")
    assert(r.getLong(1) === 524288L)     // split-sensitive conv_full_q
    assert(r.getLong(2) === 524288L)     // removing a dead-end channel: no drop
    assert(r.getDouble(3) === 0.0)
    assert(r.isNullAt(4))                // 0/0 attribution nulls out
  }

  test("srmCheck: user-grain counts, exact chi, flag fires only on real skew") {
    import spark.implicits._
    val t0 = 86400L * 1000000000L
    // balanced: 3 even vs 3 odd users, one user duplicated 5x (must count
    // once) -> chi = 0, no flag
    val dir1 = java.nio.file.Files.createTempDirectory("graft-srm1").toString
    ((0L to 5L).map(u => (t0, u, "view")) ++ Seq.fill(5)((t0, 0L, "click")))
      .toDF("ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir1/events.parquet")
    val r1 = BehaviorOps.srmCheck(spark, dir1).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2), r1.getBoolean(3)) ===
      ((3L, 3L, 0.0, false)))
    // skewed: 40 even vs 10 odd -> chi = 900/50 = 18 > 3.841 -> flag
    val dir2 = java.nio.file.Files.createTempDirectory("graft-srm2").toString
    ((0L until 40L).map(u => (t0, u * 2, "view")) ++
      (0L until 10L).map(u => (t0, u * 2 + 1, "view")))
      .toDF("ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val r2 = BehaviorOps.srmCheck(spark, dir2).collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getDouble(2), r2.getBoolean(3)) ===
      ((40L, 10L, 18.0, true)))
  }

  test("sprtMonitor: integer LLR cumsum and the three boundary decisions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sprt").toString
    val day = 86400L * 1000000000L
    // arm 0 (user 0): day 1 = 100 straight purchases (LLR blows through
    // +ln 19 -> accept_h1); arm 1 (user 1): day 1 = 2 purchases + 2 views
    // (continue), day 2 = 120 views (cumsum dives below -ln 19 -> accept_h0)
    val rows =
      Seq.fill(100)((1 * day, 0L, "purchase")) ++
      Seq.fill(2)((1 * day, 1L, "purchase")) ++ Seq.fill(2)((1 * day, 1L, "view")) ++
      Seq.fill(120)((2 * day, 1L, "view"))
    rows.toDF("ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def lnq(m: Long): Long =
      math.floor(math.log(m.toDouble) * (1L << 20) + 0.5).toLong
    def inc(n: Long, x: Long): Long =
      x * (lnq(11) - lnq(9)) + (n - x) * (lnq(39) - lnq(41))
    val got = BehaviorOps.sprtMonitor(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5)))).toMap
    val sc = (1L << 20).toDouble
    assert(got((0, "1970-01-02")) ===
      ((100L, 100L, inc(100, 100).toDouble / sc, "accept_h1")))
    assert(got((1, "1970-01-02")) === ((4L, 2L, inc(4, 2).toDouble / sc, "continue")))
    val cum2 = inc(4, 2) + inc(120, 0)
    assert(got((1, "1970-01-03")) === ((120L, 0L, cum2.toDouble / sc, "accept_h0")))
    assert(inc(100, 100) >= lnq(19) && cum2 <= -lnq(19)) // boundaries really crossed
  }

  test("ndcg: hand-computed graded metrics over a parity split") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ndcg").toString
    // train (even orderkeys): pop 101 -> 500, 102 -> 300, 103 -> 100
    // so the ranking is 101 (i=1), 102 (i=2), 103 (i=3)
    Seq((1L, 7L), (2L, 99L), (3L, 8L), (4L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 102L, 2.0), (1L, 999L, 9.0),            // test: cust 7
        (3L, 101L, 1.0),                             // test: cust 8
        (2L, 101L, 5.0), (2L, 102L, 3.0), (4L, 103L, 1.0)) // train
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val ws = BehaviorOps.NdcgWeights
    val qs = BehaviorOps.NdcgQScale
    // cust 7: rel = {999 -> 900, 102 -> 200}; idcg = 900*w1 + 200*w2;
    //         dcg = 200*w2 (102 ranks at i=2); first hit 2; hits 1 of 2
    val ndcg7 = 200L * ws(1) * qs / (900L * ws(0) + 200L * ws(1))
    // cust 8: the single part IS rank 1 -> perfect scores
    val expN = (ndcg7 + qs).toDouble / (2.0 * qs)
    val expM = (qs / 2 + qs).toDouble / (2.0 * qs)
    val expR = (qs / 2 + qs).toDouble / (2.0 * qs)
    val r = BehaviorOps.ndcg(spark, dir).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === expN)
    assert(r.getDouble(2) === expM)
    assert(r.getDouble(3) === expR)
    assert(r.getDouble(4) === 1.0)
  }
}

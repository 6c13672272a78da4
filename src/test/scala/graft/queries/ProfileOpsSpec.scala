package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Profiling operators: the CMS one-sided-error guarantee audited over
  * every key of the real corpus, a collision-free fixture where estimates
  * are exact, and containment arithmetic pinned on hand-built sets.
  */
class ProfileOpsSpec extends SparkSpec {

  test("cms: est >= exact for EVERY key on the corpus (one-sided error)") {
    val audit = ProfileOps.cmsAudit(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_partkey")), "l_partkey").cache()
    assert(audit.filter(col("overestimate") < 0).count() === 0)
    assert(audit.count() > 0)
    // the sketch is useful, not degenerate: some key estimates exactly
    assert(audit.filter(col("overestimate") === 0).count() > 0)
    audit.unpersist()
  }

  test("cms: estimates are exact when keys cannot collide") {
    import spark.implicits._
    // 3 distinct keys in 4x64 cells: no (depth,bucket) collision across
    // all 4 depths is astronomically unlikely AND deterministic (md5) —
    // pinned at authoring time
    val df = Seq(10L, 10L, 10L, 20L, 20L, 30L).toDF("k")
    val rows = ProfileOps.cmsAudit(df, "k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows === Map(10L -> ((3L, 3L)), 20L -> ((2L, 2L)), 30L -> ((1L, 1L))))
  }

  test("fk containment: partial, full, and superset-parent cases") {
    import spark.implicits._
    val child  = Seq(1L, 1L, 2L, 3L).toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val r1 = ProfileOps.pair(child, "ck", "c", parent, "pk", "p").collect()(0)
    // distinct child {1,2,3}, parent {1,2}: 2 of 3 contained
    assert(r1.getLong(2) === 3L && r1.getLong(3) === 2L && r1.getLong(4) === 2L)
    assert(math.abs(r1.getDouble(5) - 2.0 / 3.0) < 1e-15)
    assert(!r1.getBoolean(6))
    val bigParent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val r2 = ProfileOps.pair(child, "ck", "c", bigParent, "pk", "p").collect()(0)
    assert(r2.getDouble(5) === 1.0 && r2.getBoolean(6)) // superset parent: FK
  }

  test("fk profile on the corpus: the true FKs read 1.0") {
    val rows = ProfileOps.fkProfile(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(rows("lineitem.l_orderkey")) // lineitem -> orders is a real FK
    assert(rows("lineitem.l_partkey"))  // lineitem -> part is a real FK
    assert(rows("orders.o_custkey"))    // orders -> customer is a real FK
  }

  test("ols fit matches an in-memory least-squares reference; residuals uncorrelated with x") {
    val sf = "/root/testdata/sf0.001"
    val data = graft.Tables.documents(spark, sf)
      .select(col("lang"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("x"),
        col("n_chars").cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ProfileOps.olsFit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    for ((lang, rows) <- data.groupBy(_._1)) {
      // plain-Scala reference with the SAME exact-moment arithmetic
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxy = rows.map(r => r._2 * r._3).sum.toDouble
      val sxx = rows.map(r => r._2 * r._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val (gn, gs, gi, gr2) = got(lang)
      assert(gn === rows.length)
      assert(math.abs(gs - slope) < 1e-9 * math.max(1.0, math.abs(slope)))
      assert(math.abs(gi - intercept) < 1e-9 * math.max(1.0, math.abs(intercept)))
      assert(gr2 >= 0.0 && gr2 <= 1.0 + 1e-12)
      // the defining normal-equation property: residuals are orthogonal
      // to the regressor (sum of residual*x is 0 up to rounding)
      val resDotX = rows.map(r => (r._3 - (intercept + slope * r._2)) * r._2).sum
      assert(math.abs(resDotX) < 1e-6 * sxx)
    }
  }

  test("ols fit: degenerate groups (constant x, singleton) yield NULL slope/r2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ols").toString
    Seq(
      ("aa", 1L, "w1 w2 w3", 30L),   // constant x = 3 across the group
      ("aa", 2L, "v1 v2 v3", 60L),
      ("bb", 3L, "u1 u2", 20L),      // singleton group
      ("cc", 4L, "t1", 10L),         // perfect 2-point line
      ("cc", 5L, "t1 t2 t3", 30L))
      .toDF("lang", "doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ProfileOps.olsFit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("aa").isNullAt(2) && rows("aa").isNullAt(4))  // var(x)=0
    assert(rows("bb").isNullAt(2))                            // n=1
    assert(math.abs(rows("cc").getDouble(2) - 10.0) < 1e-12)  // slope 10
    assert(math.abs(rows("cc").getDouble(3) - 0.0) < 1e-12)   // intercept 0
    assert(math.abs(rows("cc").getDouble(4) - 1.0) < 1e-12)   // perfect fit
  }

  test("equidepth: buckets partition the table and are depth-balanced") {
    val sf = "/root/testdata/sf0.001"
    val rows = ProfileOps.equidepth(spark, sf).collect()
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 8))
    // equi-DEPTH: the largest bucket exceeds the smallest by at most the
    // mass tied at a boundary value — continuous prices, so ~1-2 rows
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= math.max(2L, total / 100))
    // value ranges are disjoint and ordered: hi(b) <= lo(b+1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2))
    case _ => ()
    }
  }

  test("mad outliers: median and MAD match a driver-side sort, one type") {
    val sf = "/root/testdata/sf0.001"
    val got = ProfileOps.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click" && col("value").isNotNull)
      .select(col("value"), col("event_id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(identity)
    val n = vals.length
    val med = vals((n + 1) / 2 - 1)._1  // lower median, 1-based rank (n+1)/2
    val devs = vals.map { case (v, id) => (math.abs(v - med), id) }.sortBy(identity)
    val mad = devs((n + 1) / 2 - 1)._1
    val r = got("click")
    assert(r.getLong(1) === n.toLong)
    assert(r.getDouble(2) === med && r.getDouble(3) === mad)
    assert(r.getLong(4) === devs.count(_._1 > 3 * mad).toLong)
  }

  test("lateness profile: counts match a driver-side running-max replay") {
    val sf = "/root/testdata/sf0.001"
    val got = ProfileOps.latenessProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val late = events.groupBy(_._1).values.flatMap { g =>
      var runMax = Long.MinValue
      g.sortBy(_._2).map { case (_, _, tpe, us) =>
        runMax = math.max(runMax, us)
        (tpe, runMax - us)
      }
    }.toSeq
    for ((tpe, rows) <- late.groupBy(_._1)) {
      val r = got(tpe)
      assert(r.getLong(1) === rows.length.toLong)
      assert(r.getLong(2) === rows.count(_._2 > 0).toLong)
      assert(r.getLong(5) === rows.map(_._2).max)
      assert(r.getDouble(3) <= r.getDouble(4)) // p50 <= p99
      val rate = r.getDouble(6)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("column profile: key columns are dense and unique, counts nest") {
    val sf = "/root/testdata/sf0.001"
    val rows = ProfileOps.columnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ok = rows("orders.o_orderkey")
    assert(ok.getLong(1) === ok.getLong(2))       // no nulls in the PK
    assert(ok.getLong(2) === ok.getLong(3))       // PK distinct == nonnull
    val v = rows("events.value")
    assert(v.getLong(2) <= v.getLong(1) && v.getLong(3) <= v.getLong(2))
    assert(v.getDouble(4) <= v.getDouble(5))
    assert(rows.size === 4)
  }

  test("gini: driver-side sorted-form recompute, one priority, bit-exact") {
    val sf = "/root/testdata/sf0.001"
    val rows = ProfileOps.gini(spark, sf).collect()
    for (r <- rows) { // concentration of a positive measure: 0 <= G < 1
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
    val pri = rows(0).getString(0)
    val cents = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === pri)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sortBy(identity)
    val n = cents.length.toLong
    val s = cents.map(_._1).sum
    val s1 = cents.zipWithIndex.map { case ((c, _), i) => (i + 1) * c }.sum
    val gini = 2.0 * s1.toDouble / (n.toDouble * s.toDouble) -
      (n.toDouble + 1.0) / n.toDouble
    assert(rows(0).getLong(1) === n && rows(0).getLong(2) === s)
    assert(rows(0).getDouble(3) === gini)
  }

  test("hll: daily registers max-merged equal registers built whole (merge law)") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val fromDaily = ProfileOps
      .hllRegisters(e, col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("r")).agg(max(col("m_r")).as("m_r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val whole = ProfileOps.hllRegisters(e, col("user_id"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromDaily === whole)
    assert(whole.nonEmpty)
  }

  test("hll: estimate lands within the sketch's error envelope at sf0.01") {
    // m=64 => sigma ~ 1.04/8 = 13%; 4-sigma envelope, minus the known
    // raw-estimator low bias at small n, is comfortably inside 50%
    val rows = ProfileOps.hllDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(math.abs(r.getDouble(4)) < 0.5,
        s"${r.getString(0)}: rel_err ${r.getDouble(4)}")
    }
  }

  test("hll sliding: monotone curves and final day equals the global merge") {
    val sf = "/root/testdata/sf0.001"
    val rows = ProfileOps.hllSliding(spark, sf)
      .collect()
    assert(rows.length > 1)
    // cumulative register max-merge only ever raises ranks: n_exact,
    // n_registers, and the raw estimate are all non-decreasing in day
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_exact") <= b.getAs[Long]("n_exact"))
      assert(a.getAs[Long]("n_registers") <= b.getAs[Long]("n_registers"))
      assert(a.getAs[Double]("hll_est") <= b.getAs[Double]("hll_est"))
    }
    // the last day's state is the merge of ALL partials = the registers
    // built over the whole corpus at once (the hllDistinct merge law)
    val e = graft.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val whole = ProfileOps.hllRegisters(e, col("user_id"))
      .agg(count(lit(1)).as("n_registers"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - m_r AS INT))")).as("s"))
      .head()
    val last = rows.last
    assert(last.getAs[Long]("n_registers") === whole.getAs[Long]("n_registers"))
    assert(last.getAs[Long]("n_exact") ===
      e.select(col("user_id")).distinct().count())
  }

  test("kmv overlap: merge law, exact-path identity, error envelope") {
    import graft.queries.TextOps
    val sf = "/root/testdata/sf0.01"
    val out = ProfileOps.kmvOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    // ground truth user-hash sets per type, straight from the table
    val tu = graft.Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .select(col("event_type"),
        TextOps.h32(concat(lit("kmv|"), col("user_id").cast("string"))).as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    val k = ProfileOps.KmvK.toInt
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val union = tu(a) ++ tu(b)
      // MERGE LAW: the k smallest of the union equal the k smallest of
      // (k-min(A) ∪ k-min(B)) — recompute the combined sketch directly
      val skA = tu(a).toSeq.sorted.take(k).toSet
      val skB = tu(b).toSeq.sorted.take(k).toSet
      val combined = (skA ++ skB).toSeq.sorted.take(k)
      assert(combined === union.toSeq.sorted.take(math.min(k, combined.size)))
      assert(r.getAs[Long]("sk_k") === combined.size.toLong)
      val estU = r.getAs[Double]("est_union")
      if (combined.size < k) // exact path: the sketch IS the union set
        assert(estU === union.size.toDouble &&
          r.getAs[Long]("n_union") === union.size.toLong)
      else // sketch path: k=64 => sigma ~ 13%; generous 4-sigma envelope
        assert(math.abs(r.getAs[Double]("rel_err_union")) < 0.6)
      // intersection estimate replays the membership fraction
      val jHat = combined.count(h => skA(h) && skB(h)).toDouble / combined.size
      assert(math.abs(r.getAs[Double]("est_inter") - jHat * estU) < 1e-9)
    }
  }

  test("kmv overlap pre-checkpoint plan: WindowGroupLimit top-k + broadcast pair frame") {
    // ADVICE r14: the committed digest for q_kmv_overlap is RDDScan+Sort
    // (localCheckpoint truncates the plan), so the documented scale shape
    // is audited here on the exact frame kmvOverlap checkpoints — under
    // the PlanShapeSpec discipline (no size-based broadcasts).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = ProfileOps.kmvOverlapUnchecked(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan
      val kinds = plan.collect { case p => p.getClass.getSimpleName }
      // two rank-window top-k sites: the per-type sketch build and the
      // combined-sketch re-rank both plan as WindowGroupLimit
      assert(kinds.count(_ == "WindowGroupLimitExec") >= 2,
        s"expected WindowGroupLimit top-k in: ${kinds.distinct.sorted}")
      // the |types|² pair frame rides an explicit broadcast theta join
      assert(kinds.exists(_.startsWith("BroadcastNestedLoopJoin")),
        s"expected broadcast pair frame in: ${kinds.distinct.sorted}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("kmv overlap keeps disjoint type pairs with n_inter = 0") {
    // ADVICE r14: the exact-overlap join is LEFT — a pair of types with
    // zero shared users must still appear, with n_inter 0 and
    // n_union = n_a + n_b. Fixture: three users, two disjoint types.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmv-disjoint").toString
    Seq(
      ("click", "u1", "2024-01-01T00:00:00", 1.0),
      ("click", "u2", "2024-01-01T00:00:00", 1.0),
      ("view", "u3", "2024-01-01T00:00:00", 1.0))
      .toDF("event_type", "user_id", "ts", "value")
      .selectExpr("event_type", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = ProfileOps.kmvOverlap(spark, tmp).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("type_a") === "click")
    assert(rows(0).getAs[String]("type_b") === "view")
    assert(rows(0).getAs[Long]("n_inter") === 0L)
    assert(rows(0).getAs[Long]("n_union") === 3L)
  }

  test("join-size estimate: one-sided (est >= exact) and depth-min tightens") {
    val r = ProfileOps.joinSizeEst(spark, "/root/testdata/sf0.001").collect()(0)
    val (est, exact) = (r.getLong(1), r.getLong(2))
    assert(exact > 0L)
    assert(est >= exact)          // collision mass only ADDS
    assert(r.getLong(3) === est - exact)
  }

  test("pareto point matches an in-memory reference at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val cents = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"),
        col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ProfileOps.pareto(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for ((pri, rows) <- cents.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (-r._2, r._3))
      val total = sorted.map(_._2).sum
      val cums = sorted.map(_._2).scanLeft(0L)(_ + _).tail
      val n80 = cums.indexWhere(c => 5 * c >= 4 * total) + 1
      assert(got(pri) === ((rows.length.toLong, total, n80.toLong)), pri)
    }
  }

  test("entropy: exact on power-of-two uniform; zero on a constant column") {
    import spark.implicits._
    // 8 values x count 4: log2 terms are exact in fixed-point -> 3.0 bits
    val uniform = (0 until 8).flatMap(v => Seq.fill(4)(s"v$v")).toDF("c")
    val u = ProfileOps.entropyDim(uniform, "c", "u").collect()(0)
    assert(u.getLong(1) === 32L && u.getLong(2) === 8L)
    assert(u.getDouble(3) === 3.0)
    val const = Seq.fill(10)("same").toDF("c")
    val k = ProfileOps.entropyDim(const, "c", "k").collect()(0)
    assert(k.getLong(2) === 1L && k.getDouble(3) === 0.0)
  }

  test("qdigest: hand-computed digest, estimates, and error audit") {
    import spark.implicits._
    // level-0 histogram (cents bins): (0, 5120), (1, 2), (2, 3), (3, 5120)
    // -> n = 10245, t = n div 2048 = 5. Sweep: bins 0 and 3 retain at
    // level 0 (c >= 5); bin 1 pushes to (1,0), bin 2 to (1,1); both still
    // light, push again and COMBINE at (2,0) with c = 5 >= t -> retained.
    val h0 = Seq((0L, 5120L), (1L, 2L), (2L, 3L), (3L, 5120L)).toDF("bin", "c")
    val digest = ProfileOps.qdigestCompress(
        h0.select(lit(0).as("level"), col("bin"), col("c")))
      .orderBy(col("level"), col("bin"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(digest === Seq((0, 0L, 5120L), (0, 3L, 5120L), (2, 0L, 5L)))
    // phi = 0.5: target = ceil(n/2) = 5123. Digest nodes sorted by
    // (upper, level, bin): (0,lv0) cum 5120 < 5123, then (3,lv0) cum
    // 10240 >= 5123 -> est = 3. Exact lower quantile: h0 cumsum
    // 5120/5122/5125 -> first bin reaching 5123 is 2. The rank interval
    // of est=3 is [rank(<3)+1, rank(<=3)] = [5126, 10245]; the target
    // misses it by 3 — the straddle error (the pushed-up (2,0) node),
    // NOT the 5120-point-mass at value 3, which any value-returning
    // quantile algorithm attributes wholesale. Bound 2·16·5 = 160.
    val rep = ProfileOps.qdigestReport(spark, h0,
        ProfileOps.qdigestCompress(
          h0.select(lit(0).as("level"), col("bin"), col("c"))))
      .collect()
    val r50 = rep.find(_.getInt(0) == 50).get
    assert(r50.getLong(1) === 5123L) // target_rank
    assert(r50.getLong(2) === 3L)    // est_cents
    assert(r50.getLong(3) === 2L)    // true_cents
    assert(r50.getLong(4) === 10245L) // rank_of_est = rank(<= est)
    assert(r50.getLong(5) === 3L)    // interval distance
    assert(r50.getLong(6) === 160L)  // err_bound
    assert(rep.forall(_.getLong(7) === 3L)) // n_nodes
  }

  test("qdigest: mass preservation and error-within-bound on real data") {
    val h0 = ProfileOps.qdigestH0(spark, "/root/testdata/sf0.001").cache()
    val n = h0.agg(sum(col("c"))).collect()(0).getLong(0)
    val digest = ProfileOps.qdigestCompress(
      h0.select(lit(0).as("level"), col("bin"), col("c")))
    assert(digest.agg(sum(col("c"))).collect()(0).getLong(0) === n)
    val rep = ProfileOps.qdigestReport(spark, h0, digest).collect()
    assert(rep.length === 9)
    for (r <- rep) {
      assert(r.getLong(5) <= r.getLong(6),
        s"decile ${r.getInt(0)}: rank err ${r.getLong(5)} > bound ${r.getLong(6)}")
      // the estimate never undershoots the true lower quantile by value
      // more than the node width implies; pin the cheap invariant instead:
      // est >= true (upper-bound estimates are right-biased)
      assert(r.getLong(2) >= r.getLong(3))
    }
    h0.unpersist()
  }

  test("qdigest: per-key compress == one independent sweep per key") {
    import spark.implicits._
    // two shards with very different mass: each must get its OWN threshold
    val nodes = (Seq.tabulate(40)(i => ("a", 0, i.toLong, 300L)) ++
        Seq(("b", 0, 3L, 2L), ("b", 0, 5L, 3L), ("b", 0, 9L, 4000L)))
      .toDF("k", "level", "bin", "c")
    val byKey = ProfileOps.qdigestCompressBy(nodes, "k")
      .orderBy(col("k"), col("level"), col("bin"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    for (key <- Seq("a", "b")) {
      val solo = ProfileOps.qdigestCompress(
          nodes.filter(col("k") === key).drop("k"))
        .orderBy(col("level"), col("bin"))
        .collect().map(r => (key, r.getInt(0), r.getLong(1), r.getLong(2)))
      assert(byKey.filter(_._1 == key).toSeq === solo.toSeq,
        s"per-key sweep diverged from the independent sweep for shard $key")
    }
  }

  test("qdigest merge entry: mass preserved; per-decile error within the merged bound") {
    val rep = ProfileOps.qdigestMerge(spark, "/root/testdata/sf0.001").collect()
    assert(rep.length === 9)
    for (r <- rep) {
      // abs_rank_err <= 2 x err_bound — the principled union-then-
      // recompress bound (see the merge-law test below)
      assert(r.getLong(5) <= 2 * r.getLong(6),
        s"decile ${r.getInt(0)}: merged rank err ${r.getLong(5)} > 2x bound")
      assert(r.getLong(2) >= r.getLong(3)) // upper-bound estimates right-biased
    }
  }

  test("qdigest: merge law -- union-then-recompress preserves mass and the bound") {
    // split sf0.001 events by event_id parity, digest each half, merge by
    // UNIONING the two digests' (level, bin, c) nodes and recompressing
    // (the q-digest merge), then audit the merged digest against the WHOLE
    // data's exact histogram: mass exact, per-decile rank error within the
    // principled merged bound 2 x (2·L·T_m): the shard sweeps contribute
    // displacement <= 2·L·(T_A + T_B) <= 2·L·T_m (thresholds scale with
    // mass), the recompress adds its own <= 2·L·T_m. With the root clamp
    // (ADVICE r11) the merged digest is canonical — no phantom level-17+
    // nodes — so the straddle-path argument applies uniformly.
    import org.apache.spark.sql.DataFrame
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_id"),
        greatest(least((col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType),
          lit(ProfileOps.QdUniverse - 1)), lit(0L)).as("bin"))
    def h0Of(df: DataFrame): DataFrame =
      df.groupBy(col("bin")).agg(count(lit(1)).as("c"))
    val whole = h0Of(ev).cache()
    val dA = ProfileOps.qdigestCompress(h0Of(ev.filter(col("event_id") % 2 === 0))
      .select(lit(0).as("level"), col("bin"), col("c")))
    val dB = ProfileOps.qdigestCompress(h0Of(ev.filter(col("event_id") % 2 === 1))
      .select(lit(0).as("level"), col("bin"), col("c")))
    val merged = ProfileOps.qdigestCompress(dA.unionByName(dB))
    val n = whole.agg(sum(col("c"))).collect()(0).getLong(0)
    assert(merged.agg(sum(col("c"))).collect()(0).getLong(0) === n)
    val rep = ProfileOps.qdigestReport(spark, whole, merged).collect()
    for (r <- rep)
      assert(r.getLong(5) <= 2 * r.getLong(6),
        s"decile ${r.getInt(0)}: merged rank err ${r.getLong(5)} > 2x bound")
    whole.unpersist()
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k: 3 ranked neighbors per probe, similarities in [-1,1] descending") {
    val out = VectorOps.simTopk(spark, sf).cache()
    assert(out.groupBy("probe_id").count().filter(col("count") =!= 3).count() === 0)
    assert(out.filter(abs(col("cos_sim")) > 1.0000001).count() === 0)
    val inversions = out.withColumn("prev",
      lag("cos_sim", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy("rank")))
      .filter(col("prev").isNotNull && col("cos_sim") > col("prev"))
    assert(inversions.count() === 0)
    out.unpersist()
  }

  test("LSH top-k: every neighbor shares the probe's bucket; never beats brute force") {
    val lsh = VectorOps.simLsh(spark, sf).cache()
    val brute = VectorOps.simTopk(spark, sf)
    // rank-1 LSH similarity can't exceed the true (brute) rank-1 for shared probes
    val joined = lsh.filter(col("rank") === 1)
      .select(col("probe_id"), col("cos_sim").as("lsh_best"))
      .join(brute.filter(col("rank") === 1)
        .select(col("probe_id"), col("cos_sim").as("true_best")), Seq("probe_id"))
    assert(joined.filter(col("lsh_best") > col("true_best") + 1e-12).count() === 0)
    lsh.unpersist()
  }

  private def recallOf(approx: org.apache.spark.sql.DataFrame,
                       brute: org.apache.spark.sql.DataFrame): Double = {
    val nTrue = brute.count().toDouble
    brute.join(
      approx.filter(col("probe_id") < 5).select(col("probe_id"), col("neighbor_id")),
      Seq("probe_id", "neighbor_id")).count() / nTrue
  }

  test("ANN recall@3 vs brute force: measured on the corpus, IVF floor pinned") {
    // quantifies the pruning trade the approximate scale paths make: of
    // each probe's TRUE top-3 (brute force), what fraction does the index
    // return? This corpus is near-random (true top-3 cosine ~0.25-0.40,
    // ~70 degrees), so 4-bit hyperplane LSH recall is honestly near zero —
    // per-plane agreement ~0.6, to the 4th power ~0.15 per neighbor; the
    // clustered-fixture test below is where LSH recall is asserted. IVF
    // (nprobe=1 of 8 cells) measures 1.0 here; floor at 0.5.
    val brute = VectorOps.simTopk(spark, sf)
      .select(col("probe_id"), col("neighbor_id")).cache()
    val rLsh = recallOf(VectorOps.simLsh(spark, sf), brute)
    val rIvf = recallOf(VectorOps.simIvf(spark, sf), brute)
    val rGraph = recallOf(VectorOps.graphAnn(spark, sf), brute)
    info(f"recall@3 at $sf: lsh=$rLsh%.3f ivf=$rIvf%.3f graph=$rGraph%.3f")
    assert(rIvf >= 0.5, f"IVF recall collapsed: $rIvf%.3f")
    assert(rLsh >= 0.0 && rLsh <= 1.0 && rIvf <= 1.0)
    // the beam can leave its seed bucket via table-2 edges, so graph-ANN
    // recall must never fall below plain one-bucket LSH on any corpus
    assert(rGraph >= rLsh, f"graph-ANN ($rGraph%.3f) under LSH ($rLsh%.3f)")
    assert(rGraph <= 1.0)
    brute.unpersist()
  }

  test("ANN recall@3 is exactly 1.0 on clustered data (both indexes)") {
    // the regime ANN indexes exist for: tight clusters. Cluster members
    // here are pure SCALINGS of a center, so every hyperplane projection
    // scales too — sign bits (hence the LSH bucket) are IDENTICAL by
    // construction, deterministically, whatever the md5-derived planes
    // are; cluster-mates dominate the ranking at cosine exactly 1.0. IVF
    // cell assignment is likewise scale-invariant. So both indexes must
    // return the true top-3 with recall exactly 1.0 — no probability.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val dim = 64
    val centers = Seq(
      Array.tabulate(dim)(i => math.sin(i + 1).toFloat),
      Array.tabulate(dim)(i => math.cos(2 * i + 1).toFloat),
      Array.tabulate(dim)(i => (if (i % 2 == 0) 1.0 else -0.5).toFloat))
    val scales = Seq(1.0f, 1.1f, 0.9f, 1.2f, 0.8f)
    // ids: the three scale-1.0 centers take 0,1,2 — so they are BOTH the
    // probe set (vec_id < 5) and the ONLY vectors under the IVF centroid
    // cutoff (vec_id < 8), one centroid per cluster. The remaining members
    // start at 5. (With several near-identical centroids per cluster,
    // float rounding makes mates pick different "nearest" ones and
    // scatters a cluster across cells — measured recall 0.333.)
    val rows = for {
      c <- centers.indices; (s, j) <- scales.zipWithIndex
    } yield ((if (j == 0) c else 8 + (j - 1) * 3 + c).toLong, centers(c).map(_ * s), c)
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val labels = rows.map { case (id, _, c) => (id, c) }.toDF("vec_id", "cluster")
    val brute = VectorOps.simTopk(spark, dir)
      .select(col("probe_id"), col("neighbor_id")).cache()
    // sanity: each probe's true top-3 are cluster-mates
    assert(brute
      .join(labels.select(col("vec_id").as("probe_id"), col("cluster").as("pc")), "probe_id")
      .join(labels.select(col("vec_id").as("neighbor_id"), col("cluster").as("nc")), "neighbor_id")
      .filter(col("pc") =!= col("nc")).count() === 0)
    val rLsh = recallOf(VectorOps.simLsh(spark, dir), brute)
    val rIvf = recallOf(VectorOps.simIvf(spark, dir), brute)
    // graph-ANN: cluster-mates share both hash tables (scale-invariant
    // sign bits), so the probe's seed bucket contains a mate, the mate's
    // graph edges are its cluster (cos exactly 1.0), and the beam must
    // surface the true top-3 deterministically
    val rGraph = recallOf(VectorOps.graphAnn(spark, dir), brute)
    info(f"clustered-fixture recall@3: lsh=$rLsh%.3f ivf=$rIvf%.3f graph=$rGraph%.3f")
    assert(rLsh === 1.0)
    assert(rIvf === 1.0)
    assert(rGraph === 1.0)
    // the oracle-checked entry reads the same fixture: every probe's
    // per-probe recall row is exactly (k=3, n_hit=3, recall=1.0)
    val ar = VectorOps.annRecall(spark, dir).collect()
    assert(ar.length === 3)
    assert(ar.forall(r => r.getLong(1) === 3L && r.getLong(2) === 3L
      && r.getDouble(3) === 1.0))
    brute.unpersist()
  }

  test("multi-probe IVF: nprobe=1 equals single-probe IVF; recall/cost curve is monotone") {
    // consistency: at nprobe=1 the multi-probe plan must reproduce
    // q_sim_ivf exactly (same cells, same candidates, same ranking)
    val single = VectorOps.simIvf(spark, sf)
      .select("probe_id", "rank", "neighbor_id", "cos_sim")
    val multi1 = VectorOps.simIvfMultiP(spark, sf, 1)
    assert(multi1.exceptAll(single).count() === 0)
    assert(single.exceptAll(multi1).count() === 0)
    // cost axis on the corpus: compared pairs grow with nprobe, recall
    // never decreases (a superset of cells can only add candidates)
    val brute = VectorOps.simTopk(spark, sf)
      .select(col("probe_id"), col("neighbor_id")).cache()
    val curve = Seq(1, 2, 4).map { np =>
      val pairs = VectorOps.simIvfPairs(spark, sf, np).count()
      val r = recallOf(VectorOps.simIvfMultiP(spark, sf, np), brute)
      (np, pairs, r)
    }
    curve.foreach { case (np, pairs, r) =>
      info(f"corpus $sf nprobe=$np: pairs=$pairs recall@3=$r%.3f") }
    assert(curve.sliding(2).forall { case Seq(a, b) => b._2 >= a._2 && b._3 >= a._3 - 1e-12 })
    brute.unpersist()
  }

  test("multi-probe IVF: boundary probes buy recall back, measured curve on a 3-cell fixture") {
    // The regime multi-probe exists for: a probe whose true neighbors sit
    // in OTHER cells. u ⊥ v in 64 dims; p = cos40°·u + sin40°·v is its own
    // centroid (id 2 < 8), so at nprobe=1 it searches an EMPTY cell; its
    // true top-3 (u, v, the B cluster around v) are split across cells A
    // and B. Exact expected recalls, no probability:
    //   nprobe=1: probe u finds nothing, probe v finds its cluster, p
    //             finds nothing                       -> 3/9
    //   nprobe=2: u adds cell C (finds p), p adds cell A (finds u)
    //                                                 -> 5/9
    //   nprobe=4: all three cells searched            -> 9/9
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mprobe").toString
    val dim = 64
    val u = Array.tabulate(dim)(i => if (i < 32) 1.0f else 0.0f)
    val v = Array.tabulate(dim)(i => if (i >= 32) 1.0f else 0.0f)
    val c40 = math.cos(math.toRadians(40)).toFloat
    val s40 = math.sin(math.toRadians(40)).toFloat
    val p = Array.tabulate(dim)(i => u(i) * c40 + v(i) * s40)
    val rows = Seq(
      (0L, u), (1L, v), (2L, p)) ++
      Seq(1.1f, 0.9f, 1.2f).zipWithIndex.map { case (s, j) =>
        ((8 + j).toLong, v.map(_ * s))
      }
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val brute = VectorOps.simTopk(spark, dir)
      .select(col("probe_id"), col("neighbor_id")).cache()
    val got = Seq(1, 2, 4).map { np =>
      np -> recallOf(VectorOps.simIvfMultiP(spark, dir, np), brute)
    }
    got.foreach { case (np, r) => info(f"boundary fixture nprobe=$np: recall@3=$r%.3f") }
    assert(got.map(_._2).zip(Seq(3.0 / 9, 5.0 / 9, 1.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
    brute.unpersist()
  }

  test("multi-probe IVF-PQ: candidate superset can only improve the per-probe best ADC") {
    // ivfPqMulti searches the probe's top-IvfNProbe cells where ivfPqAnn
    // searches only rank-1; same codebooks, same ADC — so per probe the
    // multi-probe minimum ADC distance is <= the single-cell one, and the
    // (probe, neighbor) stream carries no duplicates (one cell per vector)
    val single = VectorOps.ivfPqAnn(spark, sf)
      .filter(col("rank") === 1)
      .select(col("probe_id"), col("adc_dist").as("d1"))
    val multi = VectorOps.ivfPqMulti(spark, sf)
    assert(multi.groupBy("probe_id", "neighbor_id").count()
      .filter(col("count") > 1).count() === 0)
    val best = multi.filter(col("rank") === 1)
      .select(col("probe_id"), col("adc_dist").as("dm"))
    val worse = best.join(single, Seq("probe_id"))
      .filter(col("dm") > col("d1")).count()
    assert(worse === 0, "multi-probe best ADC regressed vs single-cell")
    // per-probe result depth is exactly PqTopK on the corpus (cells are
    // never that sparse at the test SFs)
    val depths = multi.groupBy("probe_id").count().collect()
    assert(depths.forall(_.getLong(1) === VectorOps.PqTopK.toLong))
  }

  test("embed dedup: pairs stay within (label, bucket) and meet the threshold") {
    val out = VectorOps.embedDedup(spark, sf).cache()
    assert(out.filter(col("cos_sim") < 0.3).count() === 0)
    assert(out.filter(col("vec_id_a") >= col("vec_id_b")).count() === 0)
    // the LSH sub-bucket only PRUNES: every emitted pair must also be a
    // within-label cosine>=0.3 pair (recomputed here the exhaustive way)
    val e = graft.Tables.embeddings(spark, sf).select(
      col("label"), col("vec_id"), col("embedding"),
      sqrt(aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)).as("nrm"))
    val full = e.select(col("label"), col("vec_id").as("vec_id_a"),
        col("embedding").as("ea"), col("nrm").as("na"))
      .join(e.select(col("label"), col("vec_id").as("vec_id_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("label"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cs", aggregate(zip_with(col("ea"), col("eb"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)
        / (col("na") * col("nb")))
      .filter(col("cs") >= 0.3)
      .select(col("label"), col("vec_id_a"), col("vec_id_b"))
    assert(out.select("label", "vec_id_a", "vec_id_b")
      .exceptAll(full).count() === 0)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("semdedup: decisions match an independently recomputed pair set") {
    val out = VectorOps.semDedup(spark, sf).cache()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(out.count() === n)
    assert(out.select("vec_id").distinct().count() === n)
    // clusters are the kmeans entry's clusters (the shared-centroid contract)
    val km = VectorOps.kmeans(spark, sf).select(col("vec_id"), col("cluster").as("kc"))
    assert(out.join(km, "vec_id").filter(col("cluster") =!= col("kc")).count() === 0)
    // independent recompute of every (cluster, bucket) near-dup pair with
    // interpreted HOF cosine; min lower-id partner must match dup_of exactly
    val e = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (a, v) => a + v)
    val v = out.select("vec_id", "cluster", "bucket").join(e, "vec_id")
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val pairs = v.select(col("cluster"), col("bucket"), col("vec_id").as("a"),
        col("embedding").as("ea"), col("nrm").as("na"))
      .join(v.select(col("cluster"), col("bucket"), col("vec_id").as("b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("cluster", "bucket"))
      .filter(col("a") < col("b"))
      .filter(dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= 0.3)
    val expected = pairs.groupBy(col("b").as("vec_id")).agg(min(col("a")).as("exp_dup"))
    assert(out.join(expected, Seq("vec_id"), "left")
      .filter(coalesce(col("dup_of"), lit(-1L)) =!= coalesce(col("exp_dup"), lit(-1L)))
      .count() === 0)
    assert(out.filter(!col("is_kept")).count() > 0, "corpus must exercise drops")
    out.unpersist()
  }

  test("kmeans: matches an independent in-memory Lloyd reimplementation exactly") {
    // plain-Scala reference: same seed rule, same quantization, same
    // floor-averaged update, same (dist, cid) tie-break — any divergence
    // in the distributed plan (partial sums, argmin encoding, centroid
    // collect) surfaces as a mismatch on SOME of the 500 vectors
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000).toLong).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cs: Seq[(Int, Array[Long])]): Map[Long, (Int, Long)] =
      vecs.map { case (id, v) =>
        id -> cs.map { case (cid, c) => (d2(v, c), cid) }.min.swap
      }.toMap
    val c0 = vecs.filter(_._1 < 4).map { case (id, v) => (id.toInt, v) }.toSeq
    val a1 = assign(c0)
    val c1 = a1.groupBy(_._2._1).toSeq.sortBy(_._1).map { case (cid, members) =>
      val vs = members.keys.map(id => vecs(id.toInt)._2).toSeq
      (cid, Array.tabulate(64)(i =>
        math.floor(vs.map(_(i)).sum.toDouble / vs.size).toLong))
    }
    val expected = assign(c1)
    val got = VectorOps.kmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).toSet.size > 1, "degenerate single cluster")
  }

  test("knn: perfect accuracy on clustered labels, chance on the random corpus") {
    import spark.implicits._
    // two tight clusters; probes sit at the holdout ids (0, 50), one in
    // each cluster — every one of the 5 votes must agree
    def v(x: Float, y: Float): Array[Float] = Array(x, y)
    val rows =
      Seq((0L, 1, v(1f, 0.1f)), (50L, 2, v(0.1f, 1f))) ++          // probes
      (1L to 6L).map(i => (i, 1, v(1f, 0.1f + i * 0.01f))) ++       // cluster 1
      (7L to 12L).map(i => (i, 2, v(0.1f + i * 0.01f, 1f)))         // cluster 2
    val got = VectorOps.knnClassifyFrom(rows.toDF("vec_id", "label", "embedding"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got === Map(0L -> ((1, 5L, true)), 50L -> ((2, 5L, true))))
    // corpus labels are independent of the embedding geometry, so the
    // honest corpus accuracy sits near chance (1/10 labels) — assert it
    // stays well below 0.5 so nobody mistakes this for a trained model
    val corpus = VectorOps.knnClassify(spark, sf).collect()
    assert(corpus.nonEmpty)
    assert(corpus.count(_.getBoolean(4)).toDouble / corpus.length < 0.5)
  }

  test("radiusNn: equals the naive quadratic join; finds neighbors across cell walls") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // fixture: p1/p2 straddle the 0.02 cell boundary 2e-7 apart -> must
    // pair up even though their grid cells differ; p3 is isolated
    val dir = java.nio.file.Files.createTempDirectory("graft-rnn").toString
    Seq(
      (1L, Array(0.0199999f, 0.0f)),
      (2L, Array(0.0200001f, 0.0f)),
      (3L, Array(0.4f, 0.4f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val fx = VectorOps.radiusNn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fx === Map(1L -> 2L, 2L -> 1L)) // p3 has no neighbor in radius
    // corpus: grid-pruned result == the naive quadratic twin, row for row
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pts = emb.select(col("vec_id"),
      expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000) AS BIGINT)").as("x"),
      expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)").as("y"))
    val naive = pts.as("a").crossJoin(pts.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x"))
          + (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("dist2"))
      .filter(col("dist2") <= VectorOps.NnRadius * VectorOps.NnRadius)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("nn_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("nn_id"), col("dist2"))
    val got = VectorOps.radiusNn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = naive.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("pqQuantize: duplicated seeds give zero distortion; corpus census is complete") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    // 4 distinct constant vectors (the seeds) + an exact twin of each:
    // every subspace codebook lands exactly on the pairs, so every cell
    // has occupancy 2 and EXACTLY zero distortion
    val consts = Seq(-0.3f, -0.1f, 0.1f, 0.3f)
    val rows = (0 until 8).map { i =>
      (i.toLong, Array.fill(64)(consts(i % 4)))
    }
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val fixture = VectorOps.pqQuantize(spark, dir).collect()
    assert(fixture.length === VectorOps.PqM * VectorOps.PqK)
    fixture.foreach { r =>
      assert(r.getLong(2) === 2L)         // n_vectors per cell
      assert(r.getDouble(3) === 0.0)      // distortion_sum
      assert(r.getDouble(4) === 0.0)
    }
    // corpus invariants: every vector encodes in every subspace, codes
    // stay inside the codebook, distortion is non-negative
    val corpus = VectorOps.pqQuantize(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    (0 until VectorOps.PqM).foreach { m =>
      val cells = corpus.filter(_.getInt(0) == m)
      assert(cells.map(_.getLong(2)).sum === n)
      assert(cells.forall(r => r.getInt(1) >= 0 && r.getInt(1) < VectorOps.PqK))
      assert(cells.forall(_.getDouble(3) >= 0.0))
    }
  }

  test("pqAnn: lossless prototype corpus — ADC equals exact distance, ranks pinned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqann").toString
    // 4 prototypes (vec 0..3 = the seeds) with constant components
    // 0.0/0.1/0.2/0.3 and exact duplicates 4..11: Lloyd assigns every
    // copy at distance 0 and the integer centroid mean reproduces each
    // prototype EXACTLY, so PQ encoding is lossless and the ADC distance
    // IS the true quantized L2 — the one corpus where an ANN result can
    // be pinned against hand arithmetic
    def proto(v: Float) = Seq.fill(64)(v)
    val rows = Seq(
      (0L, proto(0.0f)), (1L, proto(0.1f)), (2L, proto(0.2f)), (3L, proto(0.3f)),
      (4L, proto(0.0f)), (5L, proto(0.0f)), (6L, proto(0.1f)), (7L, proto(0.1f)),
      (8L, proto(0.2f)), (9L, proto(0.2f)), (10L, proto(0.3f)), (11L, proto(0.3f)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // d(Pi, Pj) = 64 dims * (100000*(i-j))^2
    val D = 64L * 100000L * 100000L
    val got = VectorOps.pqAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 1, 4L, 0L), (0L, 2, 5L, 0L), (0L, 3, 1L, D),
      (1L, 1, 6L, 0L), (1L, 2, 7L, 0L), (1L, 3, 0L, D),
      (2L, 1, 8L, 0L), (2L, 2, 9L, 0L), (2L, 3, 1L, D),
      (3L, 1, 10L, 0L), (3L, 2, 11L, 0L), (3L, 3, 2L, D),
      (4L, 1, 0L, 0L), (4L, 2, 5L, 0L), (4L, 3, 1L, D)))
  }

  test("ivfPqAnn: disjoint direction families — the cell gate excludes the nearer cross-family vector") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    // family A lives on even dims, family B on odd dims (cosine across =
    // exactly 0, within = 1 up to identical bits, so cells are A->0, B->2
    // deterministically); scales 0.1 / 0.4 inside each family. Crucially
    // d(A@0.1, B@0.1) = 6.4e11 < d(A@0.1, A@0.4) = 2.88e12: WITHOUT the
    // cell gate the cross-family vector would out-rank the family mate.
    def fam(a: Boolean, v: Float) =
      (0 until 64).map(d => if ((d % 2 == 0) == a) v else 0.0f)
    val rows = Seq(
      (0L, fam(true, 0.1f)), (1L, fam(true, 0.4f)),
      (2L, fam(false, 0.1f)), (3L, fam(false, 0.4f)),
      (4L, fam(true, 0.1f)), (5L, fam(true, 0.4f)),
      (6L, fam(false, 0.1f)), (7L, fam(false, 0.4f)),
      (8L, fam(true, 0.1f)), (9L, fam(true, 0.4f)),
      (10L, fam(false, 0.1f)), (11L, fam(false, 0.4f)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val D = 32L * 300000L * 300000L // 32 pattern dims x (4e5-1e5)^2
    val got = VectorOps.ivfPqAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 0L, 1, 4L, 0L), (0L, 0L, 2, 8L, 0L), (0L, 0L, 3, 1L, D),
      (1L, 0L, 1, 5L, 0L), (1L, 0L, 2, 9L, 0L), (1L, 0L, 3, 0L, D),
      (2L, 2L, 1, 6L, 0L), (2L, 2L, 2, 10L, 0L), (2L, 2L, 3, 3L, D),
      (3L, 2L, 1, 7L, 0L), (3L, 2L, 2, 11L, 0L), (3L, 2L, 3, 2L, D),
      (4L, 0L, 1, 0L, 0L), (4L, 0L, 2, 8L, 0L), (4L, 0L, 3, 1L, D)))
  }

  test("dimTruncRecall: ranks match a scalar double replica on a deterministic corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-trunc").toString
    // deterministic pseudo-random floats, nonzero norms, no ties; odd
    // vectors flip sign on the tail dims so the truncated view and the
    // full view genuinely disagree about who is close to whom
    val vecs = (0L until 10L).map { i =>
      i -> (0 until 64).map { d =>
        val base = (((i * 37 + d * 11) % 13).toInt - 6) / 10.0f
        if (d >= VectorOps.TruncDims && i % 2 == 1) -base else base
      }
    }
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // scalar replica of the op's exact arithmetic: left-to-right double
    // accumulation of per-component double products (the vec_dot contract)
    def dot(a: Seq[Float], b: Seq[Float], n: Int): Double =
      (0 until n).foldLeft(0.0)((s, d) => s + a(d).toDouble * b(d).toDouble)
    val m = vecs.toMap
    def cosN(a: Long, b: Long, n: Int): Double =
      dot(m(a), m(b), n) / (math.sqrt(dot(m(a), m(a), n)) * math.sqrt(dot(m(b), m(b), n)))
    val expected = (0L until 5L).flatMap { p =>
      val cands = (0L until 10L).filter(_ != p)
      def rank(n: Int) = cands.sortBy(c => (-cosN(p, c, n), c))
      val fullTop3 = rank(64).take(3).toSet
      rank(VectorOps.TruncDims).take(3).zipWithIndex.map { case (c, i) =>
        (p, i + 1, c, fullTop3.contains(c))
      }
    }
    val got = VectorOps.dimTruncRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4)))
    assert(got.toSeq === expected)
    // the audit must be non-vacuous on this corpus: truncation disagrees
    // with the full ranking somewhere
    assert(got.exists(!_._4))
  }

  test("dbscan: hand-planted squares — cores cluster, border joins smallest, noise drops") {
    import spark.implicits._
    // two tight 4-point squares (pairwise within the 0.02 radius -> every
    // member has 3 neighbors = core), one border point within radius of
    // exactly ONE core (1 neighbor < MinPts), one isolated noise point
    def p(x: Float, y: Float) = Seq(x, y)
    val rows = Seq(
      (1L, p(0.00f, 0.00f)), (2L, p(0.01f, 0.00f)),
      (3L, p(0.00f, 0.01f)), (4L, p(0.01f, 0.01f)),
      (5L, p(0.028f, 0.00f)),                        // border: sees only 2
      (11L, p(0.50f, 0.50f)), (12L, p(0.51f, 0.50f)),
      (13L, p(0.50f, 0.51f)), (14L, p(0.51f, 0.51f)),
      (99L, p(0.90f, 0.90f)))                        // noise
    val got = VectorOps.dbscanFrom(rows.toDF("vec_id", "embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 4L, 1L), (11L, 4L, 0L)))
  }

  test("pcaPower: recovers the dominant axis; a constant dim centers to EXACTLY zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
    // dim 3 is constant 0.5 (nonzero mean, zero variance): the exact-integer
    // centering n·Σqq − ΣqΣq makes its row/column of C' identically 0, so
    // its loading is 0.0 EXACTLY (never touched by any matvec). dim 5
    // carries 16x the variance of dim 20, so PC1 is e5 with sign fixed
    // by the all-ones start; dim 20's residual decays as (1/16)^24.
    val rows = Seq(0.4f, 0.4f, -0.4f, -0.4f).zip(
      Seq(0.1f, -0.1f, 0.1f, -0.1f)).zipWithIndex.map { case ((a, b), i) =>
      val v = Array.fill(64)(0f)
      v(3) = 0.5f; v(5) = a; v(20) = b
      (i.toLong, v.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.pcaPower(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size === 64)
    assert(got(3)._1 === 0.0)
    assert(math.abs(got(5)._1 - 1.0) < 1e-12)
    assert(math.abs(got(20)._1) < 1e-20)
    // var explained = 0.16/(0.16+0.01) up to quantization
    assert(got(5)._3 > 0.93 && got(5)._3 < 0.95)
    assert(got(5)._2 > 0.0)
  }

  test("pcaProject: label means sit at the planted ±0.4 poles with ~zero spread") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pcaproj").toString
    // same geometry as the pcaPower fixture, labels split by the dim-5
    // sign: PC1 = e5, so label 0 projects to ~+0.4 and label 1 to ~-0.4;
    // the only within-label variation rides dim 20, whose loading decayed
    // to ~1e-29 — variance collapses to the floor-quantization residue
    val rows = Seq(
      (0L, 0.4f, 0.1f, 0), (1L, 0.4f, -0.1f, 0),
      (2L, -0.4f, 0.1f, 1), (3L, -0.4f, -0.1f, 1)).map { case (i, a, b, lab) =>
      val v = Array.fill(64)(0f)
      v(3) = 0.5f; v(5) = a; v(20) = b
      (i, v.toSeq, lab)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.pcaProject(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(0, 1))
    assert(got(0)._1 === 2L && got(1)._1 === 2L)
    assert(got(0)._2 > 0.39 && got(0)._2 < 0.41)
    assert(got(1)._2 > -0.41 && got(1)._2 < -0.39)
    assert(got(0)._3 >= 0.0 && got(0)._3 < 1e-9)
    assert(got(1)._3 >= 0.0 && got(1)._3 < 1e-9)
  }

  test("jlAudit: exact true distances; identical vectors sketch to zero exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jl").toString
    // ids 0 and 2 are IDENTICAL vectors: d2_true = 0 (ratio null) and the
    // sketch estimate is exactly 0 (same projections). ids 0 and 1 are
    // orthogonal unit vectors: d2_true = 2.0 exactly (the float dots are
    // exact on 0/1 components); the sketch value depends on the md5
    // planes, but ratio must equal d2_jl / 2 bitwise.
    val z = Array.fill(64)(0f)
    def unit(i: Int) = { val v = z.clone(); v(i) = 1f; v.toSeq }
    Seq((0L, unit(0), 0), (1L, unit(1), 0), (2L, unit(0), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.jlAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    assert(got.keySet === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(got((0L, 2L))._1 === 0.0 && got((0L, 2L))._2 === 0.0)
    assert(got((0L, 2L))._3 === None) // 0/0 guarded to null, never NaN
    assert(got((0L, 1L))._1 === 2.0)
    assert(got((0L, 1L))._3 === Some(got((0L, 1L))._2 / 2.0))
    assert(got((1L, 2L))._1 === 2.0)
  }

  test("hardNegatives: nearest same-label vector is excluded, rest rank by cosine") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hneg").toString
    // probe 0 (label 0) at [1,0]; id 10 shares its label at cosine ~1 and
    // must NOT appear; the three different-label vectors rank by cosine:
    // 11 (~0.90) > 13 (~0.71) > 12 (0.0)
    Seq(
      (0L, Seq(1f, 0f), 0),
      (10L, Seq(0.99f, 0.01f), 0),
      (11L, Seq(0.9f, 0.436f), 1),
      (12L, Seq(0f, 1f), 1),
      (13L, Seq(0.7f, 0.7f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getInt(4), r.getDouble(5)))
    val probe0 = got.filter(_._1 == 0L)
    assert(probe0.map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1, 11L, 1), (2, 13L, 2), (3, 12L, 1)))
    assert(probe0.map(_._5).toSeq === probe0.map(_._5).sorted.reverse.toSeq)
    // no same-label pair anywhere in the output
    assert(got.forall { case (p, _, _, nl, _) =>
      val pl = Map(0L -> 0, 10L -> 0, 11L -> 1, 12L -> 1, 13L -> 2)(p)
      nl != pl
    })
  }

  test("hybridRrf: both-list candidates outrank a single-list dense winner") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rrf").toString
    // dense ranks for probe 0: 10 (cos~1) > 11 (0.8) > 12 (0.0); lexical
    // ranks over probe terms {alpha,beta,gamma}: 11 (3 hits) > 12 (2 hits),
    // 10 absent. RRF: 11 = 1/62+1/61 > 12 = 1/63+1/62 > 10 = 1/61 — the
    // candidate each leg agrees on beats the dense-only winner.
    Seq(
      (0L, Seq(1f, 0f)),
      (10L, Seq(1f, 0.001f)),
      (11L, Seq(0.8f, 0.6f)),
      (12L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq(
      (0L, "alpha beta gamma"),
      (10L, "zz qq ww"),
      (11L, "alpha beta gamma delta"),
      (12L, "alpha beta xi yy"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = VectorOps.hybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.get(4)).map(_.asInstanceOf[Int]), r.getDouble(5)))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq === Seq(
      (0L, 1, 11L, Some(2), Some(1)),
      (0L, 2, 12L, Some(3), Some(2)),
      (0L, 3, 10L, Some(1), None)))
    // the fused score is the exact two-term sum of the rank reciprocals
    val byId = got.map(t => t._3 -> t._6).toMap
    assert(byId(11L) === 1.0 / 62 + 1.0 / 61)
    assert(byId(12L) === 1.0 / 63 + 1.0 / 62)
    assert(byId(10L) === 1.0 / 61)
  }

  test("mmr: diversity demotes the near-duplicate that plain top-k ranks second") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    // probe 0 = (1, 0); 10 and 11 are a near-duplicate pair hugging the
    // probe (rel ~.990, mutual sim ~1.0); 12 is half as relevant but
    // nearly orthogonal to the pair. Relevance order: 10, 11, 12.
    // MMR order: 10, then 12 (11's score .990 - sim(11,10) ~ -0.01 loses
    // to 12's 0.5 - 0.374 = +0.126), then 11.
    Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(0.99f, 0.14f)),
      (11L, Array(0.989f, 0.141f)),
      (12L, Array(0.5f, -0.866f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 1, 10L), (0L, 2, 12L), (0L, 3, 11L)))
    // greedy prefix property on the real corpus: every probe's first MMR
    // pick IS its top-relevance candidate
    val sf = "/root/testdata/sf0.001"
    val first = VectorOps.mmrRerank(spark, sf).filter(col("mmr_rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val top1 = VectorOps.simTopk(spark, sf).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(first === top1)
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties of the LLM-tier text operators over the driver testdata
  * (sf0.001) and tiny synthetic frames.
  */
class TextOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("exact dedup: every doc keeps a group representative <= its own id") {
    val out = TextOps.dedupExact(spark, sf)
    assert(out.filter(col("keep_doc_id") > col("doc_id")).count() === 0)
    assert(out.filter(col("is_dup") === 1 && col("doc_id") === col("keep_doc_id")).count() === 0)
  }

  test("minhash clustering: every doc assigned once, to a representative <= itself") {
    val out = TextOps.dedupMinhash(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf).count()
    assert(out.count() === total)
    assert(out.select("doc_id").distinct().count() === total)
    assert(out.filter(col("cluster_id") > col("doc_id")).count() === 0)
    assert(out.filter(col("is_dup") === 1 && col("doc_id") === col("cluster_id")).count() === 0)
    assert(out.filter(col("is_dup") === 0 && col("doc_id") =!= col("cluster_id")).count() === 0)
    out.unpersist()
  }

  test("minhash clustering: identical-token-set docs share a cluster") {
    // identical sets share every band → identical buckets → same cluster_id
    val sets = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        sha2(concat_ws(" ", array_sort(array_distinct(
          split(lower(trim(col("text"))), "\\s+")))), 256).as("set_key"))
    val clustersPerSet = TextOps.dedupMinhash(spark, sf)
      .join(sets, Seq("doc_id"))
      .groupBy("set_key")
      .agg(countDistinct("cluster_id").as("n_clusters"),
        count(lit(1)).as("n_docs"))
    assert(clustersPerSet.filter(col("n_clusters") > 1).count() === 0)
    // the testdata does contain identical-set groups, so the test has teeth
    assert(clustersPerSet.filter(col("n_docs") > 1).count() > 0)
  }

  test("simhash: deterministic across runs and bounded to 32 bits") {
    val a = TextOps.dedupSimhash(spark, sf)
    val b = TextOps.dedupSimhash(spark, sf)
    assert(a.exceptAll(b).count() === 0)
    assert(a.filter(col("simhash") < 0 || col("simhash") >= (1L << 32)).count() === 0)
  }

  test("simhash clustering: every doc assigned once, to a representative <= itself") {
    val out = TextOps.dedupSimhashCluster(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf).count()
    assert(out.count() === total)
    assert(out.select("doc_id").distinct().count() === total)
    assert(out.filter(col("cluster_id") > col("doc_id")).count() === 0)
    assert(out.filter(col("is_dup") === 1 && col("doc_id") === col("cluster_id")).count() === 0)
    assert(out.filter(col("is_dup") === 0 && col("doc_id") =!= col("cluster_id")).count() === 0)
    out.unpersist()
  }

  test("simhash clustering: identical signatures share a cluster; corpus has real dups") {
    val out = TextOps.dedupSimhashCluster(spark, sf).cache()
    // same signature ⇒ same 4 band buckets ⇒ same cluster
    val clustersPerSig = out.groupBy("simhash")
      .agg(countDistinct("cluster_id").as("n_clusters"), count(lit(1)).as("n_docs"))
    assert(clustersPerSig.filter(col("n_clusters") > 1).count() === 0)
    assert(clustersPerSig.filter(col("n_docs") > 1).count() > 0)
    out.unpersist()
  }

  test("hamming verify: band collision alone does not merge; cap guards hot buckets") {
    import spark.implicits._
    // 32-bit signatures under 4×8-bit banding, Hamming radius 3:
    //   A=0, C=1, D=3 are mutual near-dups (Hamming <= 2);
    //   B=0xFF00 SHARES bands 0, 2, 3 with A (all zero) but sits at
    //   Hamming 8 — the false-positive class band-collision clustering
    //   merged and the verify stage must reject.
    val sigs = Seq((1L, 0L), (2L, 0xFF00L), (3L, 1L), (4L, 3L))
      .toDF("doc_id", "simhash")
    val out = TextOps.hammingClustersFrom(sigs, "simhash",
        nBands = 4, bandBits = 8, hammingMax = 3, bucketCap = 1024)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) === ((1L, 0)))
    assert(out(3L) === ((1L, 1)))
    assert(out(4L) === ((1L, 1)))
    // shares three of four bands with the cluster, still no merge
    assert(out(2L) === ((2L, 0)))
    // stop-bucket mechanism (cap 1): every shared bucket is "hot", so
    // even true near-dups emit no candidates — all singletons
    val capped = TextOps.hammingClustersFrom(sigs, "simhash",
        nBands = 4, bandBits = 8, hammingMax = 3, bucketCap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("dedup cc verified: refines the collision components, rejects weak pairs") {
    val ccv = TextOps.dedupCCVerified(spark, sf).cache()
    val cc = TextOps.dedupCC(spark, sf)
      .select(col("doc_id"), col("component_id").as("cc_comp"))
    // a verified edge implies a shared bucket, so verified components
    // REFINE the collision components: each maps into exactly one
    val joined = ccv.select(col("doc_id"), col("component_id").as("v_comp"))
      .join(cc, Seq("doc_id")).cache()
    assert(joined.groupBy("v_comp")
      .agg(countDistinct("cc_comp").as("n")).filter(col("n") > 1).count() === 0)
    // and the verify stage actually rejects pairs on this corpus: some
    // collision component splits into several verified components
    assert(joined.groupBy("cc_comp")
      .agg(countDistinct("v_comp").as("n")).filter(col("n") > 1).count() > 0)
    // precision audit on the members the output lets us pin exactly: a
    // 2-member verified component's pair IS a verified edge, so its
    // exact token-set Jaccard must clear the tau = 4/5 floor
    assert(ccv.filter(col("is_dup") === 1).count() > 0)
    val twos = ccv.groupBy("component_id").count().filter(col("count") === 2)
      .select(col("component_id"))
    val members = ccv.join(twos, Seq("component_id"))
      .select(col("component_id"), col("doc_id"))
    val tokSets = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(org.apache.spark.sql.functions
        .transform(array_distinct(split(lower(trim(col("text"))), "\\s+")),
          tk => TextOps.h32(tk))).as("th"))
    val pairJ = members.groupBy("component_id")
      .agg(min("doc_id").as("a"), max("doc_id").as("b"))
      .join(tokSets.select(col("doc_id").as("a"), col("th").as("th_a")), Seq("a"))
      .join(tokSets.select(col("doc_id").as("b"), col("th").as("th_b")), Seq("b"))
      .withColumn("ni", size(array_intersect(col("th_a"), col("th_b"))))
      .withColumn("bad", col("ni") * TextOps.CcJaccardTauDen <
        (size(col("th_a")) + size(col("th_b")) - col("ni")) * TextOps.CcJaccardTauNum)
    assert(pairJ.count() > 0)
    assert(pairJ.filter(col("bad")).count() === 0)
    joined.unpersist(); ccv.unpersist()
  }

  test("incremental verified dedup: batch update == full recompute; bridge merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    def txt(toks: Seq[String]) = toks.mkString(" ")
    val a = (1 to 40).map(i => s"t$i")  // cluster-A token universe
    val u = (1 to 40).map(i => s"u$i")  // bridge universe (disjoint)
    val z = (1 to 25).map(i => s"z$i")  // exact-dup universe
    val w = (1 to 30).map(i => s"w$i")  // batch-batch universe
    // ids: % 10 == 0 -> batch, else existing (the dedupIncremental split)
    val docs = Seq(
      1L -> txt(a),                                   // existing
      2L -> txt(a.take(38) ++ Seq("a1", "a2")),       // J(1,2)=38/42≈.905
      10L -> txt(a.take(39) :+ "b1"),                 // batch, J(1,10)≈.951
      // bridge: 3 and 7 are NOT near-dups of each other (J≈.739) but
      // batch doc 20 is a near-dup of BOTH -> components must merge
      3L -> txt(u.take(37) ++ Seq("c1", "c2", "c3")), // J(3,20)=37/43≈.860
      7L -> txt(u.drop(3) ++ Seq("d1", "d2", "d3")),  // J(7,20)=37/43≈.860
      // J(3,7) = |u4..u37| / 46 = 34/46 ≈ .739 < 4/5 — no direct edge
      20L -> txt(u),                                  // batch bridge
      30L -> txt((1 to 20).map(i => s"v$i")),         // batch, no match
      5L -> txt(z),                                   // existing
      60L -> txt(z),                                  // batch exact dup of 5
      40L -> txt(w),                                  // batch
      50L -> txt(w.take(29) :+ "x1")                  // batch, J(40,50)≈.935
    )
    docs.map { case (id, t) => (id, t, "en", "src") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val full = TextOps.dedupCCVerified(spark, dir)
      .select(col("doc_id"), col("component_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incRows = TextOps.dedupIncVerified(spark, dir).collect()
    val inc = incRows.map(r => r.getAs[Long]("doc_id")
      -> r.getAs[Long]("component_id")).toMap
    // the update path reproduces the full recompute EXACTLY
    assert(inc === full)
    // the bridge actually merged: 3, 7, 20 share min-id component 3
    assert(inc(3L) === 3L && inc(7L) === 3L && inc(20L) === 3L)
    // cluster A absorbed the batch member; exact dup pair collapsed
    assert(inc(10L) === inc(1L) && inc(60L) === inc(5L))
    // unmatched batch doc founds its own singleton
    assert(inc(30L) === 30L)
    // within-batch near-dups cluster too
    assert(inc(50L) === inc(40L))
    // is_batch labels the split, is_dup the non-representatives
    val flags = incRows.map(r => r.getAs[Long]("doc_id")
      -> (r.getAs[Int]("is_batch"), r.getAs[Int]("is_dup"))).toMap
    assert(flags.forall { case (id, (b, _)) => (id % 10 == 0) == (b == 1) })
    assert(flags(20L)._2 === 1 && flags(1L)._2 === 0 && flags(30L)._2 === 0)
  }

  test("dedupCCVerifiedFrom: precomputed docSigs path equals the inline path") {
    // the r15 shared-signature seam: signatures are a pure function of
    // th, so feeding doc-level signatures must reproduce the inline
    // contracted-class signature pass bit for bit
    val ts = TextOps.docTokSets(spark, sf)
    val sigAggs = (0 until 12).map { i =>
      min((col("h") * lit(TextOps.MinhashA(i)) + lit(TextOps.MinhashB(i)))
        % lit(TextOps.MinhashP)).as(s"sig$i")
    }
    val ds = ts.select(col("doc_id"), explode(col("th")).as("h"))
      .groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    val inline = TextOps.dedupCCVerifiedFrom(ts).collect().toSeq
    val seeded = TextOps.dedupCCVerifiedFrom(ts, Some(ds)).collect().toSeq
    assert(seeded === inline)
  }

  test("fingerprint: at most 5 ranked ascending hashes per doc") {
    val fp = TextOps.fingerprint(spark, sf).cache()
    assert(fp.groupBy("doc_id").count().filter(col("count") > 5).count() === 0)
    // rank order == hash order within a doc
    val withPrev = fp.withColumn("prev",
      lag("shingle_hash", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("rank")))
    assert(withPrev.filter(col("prev").isNotNull &&
      col("shingle_hash") < col("prev")).count() === 0)
    fp.unpersist()
  }

  test("text stats: ratios in [0,1], token counts consistent") {
    val ts = TextOps.textStats(spark, sf).cache()
    assert(ts.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(ts.filter(col("n_distinct_tokens") > col("n_tokens")).count() === 0)
    assert(ts.filter(col("n_bpe_tokens") < col("n_tokens")).count() === 0)
    ts.unpersist()
  }

  test("lang id: prediction is always one of the known codes") {
    val out = TextOps.langId(spark, sf)
    assert(out.filter(!col("pred_lang").isin("en", "es", "de", "fr", "und")).count() === 0)
  }

  test("decontaminate: fixture hits are exact and the eval side broadcasts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-decon").toString
    Seq(
      (0L,  "the quick brown fox jumps"),   // eval (id % 20 == 0)
      (40L, "zzz yyy xxx www"),             // eval
      (1L,  "a quick brown fox runs"),      // shares "quick brown fox": 1/3
      (2L,  "totally different text here"), // clean: absent from output
      (3L,  "the quick brown fox jumps"),   // verbatim eval copy: 3/3
      (41L, "zzz yyy xxx qqq"),             // shares "zzz yyy xxx": 1/2
      (5L,  "ab"))                          // <3 tokens: no shingles, absent
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.decontaminate(spark, dir)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet === Set(1L, 3L, 41L))
    assert(rows(1L) === ((3, 1L, 1.0 / 3)))
    assert(rows(3L) === ((3, 3L, 1.0)))
    assert(rows(41L) === ((2, 1L, 0.5)))
    // the scale contract: the tiny eval shingle set is the BROADCAST side,
    // so the training corpus is probed map-side and never shuffles
    assert(out.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
  }

  test("containment: catches a quoted subset that Jaccard misses, directed small-into-large") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val quote = "alpha beta gamma delta epsilon zeta" // 6 tokens, 4 shingles
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, quote),                  // the short doc
      (2L, s"$quote $filler"),      // contains doc 1 verbatim + 30 filler tokens
      (3L, "totally unrelated words again and again repeated"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextOps.dedupContain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // 1 ⊂ 2 at containment 1.0, directed (contained first); nothing else
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
    // the same pair is INVISIBLE to resemblance dedup: tiny Jaccard
    assert(TextOps.dedupNgram(spark, dir).count() === 0)
  }

  test("split leakage: fixture hits are exact and valid docs count for neither side") {
    import spark.implicits._
    // ids chosen for their hash-split assignment: 2,3,5 -> train,
    // 29,35,47 -> test, 1 -> valid (pinned; the split hash is stable)
    val dir = java.nio.file.Files.createTempDirectory("graft-leak").toString
    Seq(
      (2L,  "the quick brown fox jumps"),    // train
      (3L,  "the quick brown cat sits"),     // train
      (5L,  "ab"),                           // train, <3 tokens: no shingles
      (29L, "a quick brown fox runs today"), // test: 1 of 4 shingles leaked
      (35L, "the quick brown fox jumps"),    // test: verbatim train copy, 3/3
      (47L, "totally unrelated clean text"), // test, clean: absent
      (1L,  "the quick brown fox jumps"))    // VALID copy: must count nowhere
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.splitLeakage(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 35: "the quick brown" occurs in train docs 2 AND 3 -> max 2; if
    // the valid doc 1 leaked into the train side this would read 3
    assert(rows === Map(
      29L -> ((4, 1L, 1L, 0.25)),
      35L -> ((3, 3L, 2L, 1.0))))
  }

  test("stop-shingle df-cap: boilerplate-only candidates drop, genuine pairs survive") {
    import spark.implicits._
    // hand-built (doc_id, h) shingle frames: shingle 100 is "boilerplate"
    // (posts in 11 docs), shingles 1..4 are genuine content shared by the
    // real near-dup pair (1, 2); doc 11 is a boilerplate-ONLY doc whose
    // sole route to any candidate is the hot shingle
    val sh = (Seq(
      1L -> Seq(1L, 2L, 3L, 100L),
      2L -> Seq(1L, 2L, 3L, 4L, 100L),
      11L -> Seq(100L)) ++
      (3 to 10).map(i => i.toLong -> Seq(100L, 200L + i)))
      .toDF("doc_id", "h")
    // uncapped (production constant, far above any df here): doc 11 is
    // contained in every doc carrying shingle 100
    val uncapped = TextOps.dedupContainFrom(sh, TextOps.StopShingleDfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.contains((1L, 2L)))
    assert(uncapped.count(_._1 == 11L) === 10)
    // capped at 5: df(100)=11 > 5 drops it from the postings — the
    // boilerplate-only pairs vanish, the genuine pair survives intact
    val capped = TextOps.dedupContainFrom(sh, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((1L, 2L)))

    // split leakage: train docs 2,3 / test doc 29 (split-hash-pinned ids);
    // shingle 100 in both train docs, shingle 7 in one
    val shLeak = Seq(
      2L -> Seq(7L, 100L),
      3L -> Seq(100L),
      29L -> Seq(7L, 100L)).toDF("doc_id", "h")
    val unc = TextOps.splitLeakageFrom(shLeak, TextOps.StopShingleDfCap).collect()
    assert(unc.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))).toSeq === Seq((29L, 2, 2L, 2L, 1.0)))
    // cap 1: df(100)=2 in train > 1 — it neither counts as leakage nor
    // reaches the probe join; only shingle 7 remains
    val cap1 = TextOps.splitLeakageFrom(shLeak, 1).collect()
    assert(cap1.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))).toSeq === Seq((29L, 2, 1L, 1L, 0.5)))
  }

  test("decontaminate bloom: exact answer at any fpp, probe is a map-side might_contain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-decon-bloom").toString
    Seq(
      (0L,  "the quick brown fox jumps"),
      (40L, "zzz yyy xxx www"),
      (1L,  "a quick brown fox runs"),
      (2L,  "totally different text here"),
      (3L,  "the quick brown fox jumps"),
      (41L, "zzz yyy xxx qqq"),
      (5L,  "ab"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = TextOps.decontaminate(spark, dir).collect().toSeq
    val bloom = TextOps.decontaminateBloom(spark, dir)
    assert(bloom.collect().toSeq === exact)
    // the prefilter is really in the plan, below the confirm join
    assert(bloom.queryExecution.optimizedPlan.toString.contains("might_contain"))
    // 64-bit bloom => fpp ~ 1, every shingle survives the prefilter — the
    // exact confirm join alone must still produce the exact answer
    assert(TextOps.decontaminateBloom(spark, dir, numBits = 64)
      .collect().toSeq === exact)
  }

  test("decontaminate bloom: matches the broadcast-exact plan on the corpus") {
    assert(TextOps.decontaminateBloom(spark, sf).collect().toSeq ===
      TextOps.decontaminate(spark, sf).collect().toSeq)
  }

  test("chunk dedup: catches boilerplate inside non-duplicate documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkdedup").toString
    val boiler = (1 to 50).map(i => s"b$i").mkString(" ")
    Seq(
      (1L, boiler),                                              // 1 chunk
      (2L, boiler + " " + (1 to 30).map(i => s"x$i").mkString(" ")), // 2 chunks
      (3L, (1 to 40).map(i => s"y$i").mkString(" ")))            // unique
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.chunkDedup(spark, dir).collect()
    // docs 1 and 2 are NOT document-level duplicates, but share chunk 0
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_occurrences") === 2L)
    assert(out.head.getAs[Long]("n_docs") === 2L)
    assert(out.head.getAs[Long]("keep_doc_id") === 1L)
    assert(TextOps.dedupExact(spark, dir)
      .filter(col("is_dup") === 1).count() === 0)
  }

  test("decontaminate: only training docs appear, rates in (0,1]") {
    val out = TextOps.decontaminate(spark, sf).cache()
    assert(out.filter(col("doc_id") % 20 === 0).count() === 0)
    assert(out.filter(col("hit_rate") <= 0 || col("hit_rate") > 1).count() === 0)
    assert(out.filter(col("n_hits") > col("n_shingles")).count() === 0)
    out.unpersist()
  }

  test("vocab profile: invariants + one slice recomputed from raw tokens") {
    val sf = "/root/testdata/sf0.001"
    val out = TextOps.vocabProfile(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, types, hapax, sumSq) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(types <= n && hapax <= types)
      assert(sumSq >= n)                   // Σn_i² ≥ Σn_i (each n_i ≥ 1)
      val inv = r.getDouble(5)
      assert(inv >= 1.0 - 1e-12 && inv <= types.toDouble + 1e-9) // 1 ≤ (Σn)²/Σn² ≤ V
    }
    // recompute the first slice naively from the raw text
    val src = out(0).getString(0)
    val toks = graft.Tables.documents(spark, sf)
      .filter(col("source") === src).select(col("text")).collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
    val counts = toks.groupBy(identity).map(_._2.length.toLong)
    assert(out(0).getLong(1) === toks.length.toLong)
    assert(out(0).getLong(2) === counts.size.toLong)
    assert(out(0).getLong(3) === counts.count(_ == 1L).toLong)
    assert(out(0).getLong(4) === counts.map(c => c * c).sum)
  }

  test("cluster profile partitions the corpus; sizes agree with the CC labels") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.clusterProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val labels = TextOps.dedupCC(spark, sf).collect()
      .map(r => r.getLong(1))
    assert(rows.map(_._3).sum === labels.length.toLong) // every doc in ONE cell
    val wantHist = labels.groupBy(identity).values.map(_.size)
      .groupBy(identity).map { case (sz, cs) => (sz.toLong, cs.size.toLong) }
    assert(rows.map(r => r._1 -> r._2).toMap === wantHist)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
  }

  test("minhash audit: estimates and Jaccard bounded; exact duplicates read 1.0") {
    val rows = TextOps.minhashEst(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, jac, err) =>
      assert(est >= 0.0 && est <= 1.0 && jac >= 0.0 && jac <= 1.0)
      assert(err === est - jac)
      // J=1 means identical hash sets, so every minhash component
      // agrees: the estimator CANNOT miss an exact duplicate
      if (jac == 1.0) assert(est === 1.0)
    }
    // the sf0.001 corpus contains exact near-dup pairs; the audit slice
    // must surface at least one high-similarity pair to be useful
    assert(rows.exists(_._2 == 1.0))
  }

  test("langid eval: counts reconcile with the per-doc predictions") {
    val sf = "/root/testdata/sf0.001"
    val p = TextOps.langId(spark, sf).collect()
      .map(r => (r.getString(6), r.getString(5))) // (lang, pred_lang)
    val got = TextOps.langIdEval(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val classes = (p.map(_._1) ++ p.map(_._2)).distinct
    assert(got.keySet === classes.toSet)
    for (c <- classes) {
      val (support, nPred, tp) = got(c)
      assert(support === p.count(_._1 == c).toLong, s"$c support")
      assert(nPred === p.count(_._2 == c).toLong, s"$c n_pred")
      assert(tp === p.count(x => x._1 == c && x._2 == c).toLong, s"$c tp")
      assert(tp <= math.min(support, nPred))
    }
    // micro-sums reconcile: Σtp = matches, Σsupport = Σn_pred = docs
    assert(got.values.map(_._3).sum === p.count(x => x._1 == x._2).toLong)
    assert(got.values.map(_._1).sum === p.length.toLong)
    assert(got.values.map(_._2).sum === p.length.toLong)
  }

  test("inverted index: postings truncate at the cap, stats stay full") {
    import spark.implicits._
    // 'common' in 10 docs (df over the 8 cap), twice in doc 1;
    // 'rare' in one doc
    val docs = ((1L until 11L).map(i =>
      (i, if (i == 1) "common common" else "common")) :+ (11L, "rare"))
      .toDF("doc_id", "text")
    val rows = TextOps.invertedIndexFrom(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // df and total_tf count EVERYTHING; only the posting list truncates
    assert(rows("common") === ((10L, 11L, "1,2,3,4,5,6,7,8")))
    assert(rows("rare") === ((1L, 1L, "11")))
  }

  test("collocations: PMI ranks association above frequency, ties by pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // (strong, coffee): 5/5/5 — perfect association. (a, c) and (d, b):
    // frequent (10) but with busier unigrams. (a, b): 5 co-occurrences of
    // two popular words — the lowest score despite equal pair count.
    val docs = Seq.fill(5)("strong coffee") ++ Seq.fill(5)("a b") ++
      Seq.fill(10)("a c") ++ Seq.fill(10)("d b")
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    def lq(m: Long): Long =
      math.floor(math.log(m.toDouble) * TextOps.BmScale + 0.5).toLong
    // N = 60 tokens; replica of the quantized score
    def pmi(cxy: Long, cx: Long, cy: Long): Long =
      lq(cxy) + lq(60) - lq(cx) - lq(cy)
    assert(rows.toSeq === Seq(
      ("strong", "coffee", pmi(5, 5, 5)),
      ("a", "c", pmi(10, 15, 10)),
      ("d", "b", pmi(10, 10, 15)),
      ("a", "b", pmi(5, 15, 15))))
  }

  test("labelSpread: majority vote inside components, held-out accuracy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    Seq(
      // component {4, 5}: seed 4 says 'en'; 5 (true 'de') gets 'en' -> wrong
      (4L, "alpha beta gamma delta epsilon", "en"),
      (5L, "alpha beta gamma delta epsilon", "de"),
      // component {8, 9}: seed 8 says 'fr'; 9 (true 'fr') -> correct
      (8L, "uno dos tres cuatro cinco", "fr"),
      (9L, "uno dos tres cuatro cinco", "fr"),
      // unlabeled singleton: no seed in its component -> never assigned
      (3L, "completely unrelated words entirely", "zh"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.labelSpread(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows === Map(
      "en" -> ((1L, 0L, 0.0)),
      "fr" -> ((1L, 1L, 1.0))))
  }

  test("sourceOverlap: shingle-set Jaccard, within-source duplicates collapse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-overlap").toString
    Seq(
      (1L, "s1", "a b c d"),  // shingles {abc, bcd}
      (2L, "s1", "a b c d"),  // duplicate doc: source set must NOT grow
      (3L, "s2", "a b c e"),  // shingles {abc, bce} -> inter with s1 = 1
      (4L, "s3", "x y z"))    // disjoint: no pair row at all
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(rows.keySet === Set(("s1", "s2")))
    assert(rows(("s1", "s2"))  === ((1L, 2L, 2L, 1.0 / 3.0)))
  }

  test("bm25: tf, length norm, and idf order the ranking; arithmetic pinned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // 'hash' appears in 3 docs (common), 'vector' in 1 (rare); docs 1 and 2
    // have the same length, docs 2 and 3 the same tf
    Seq(
      (1L, "hash x x x"),                  // tf=1, dl=4
      (2L, "hash hash x x"),               // tf=2, dl=4 — beats doc 1 on tf
      (3L, "hash hash x x x x x x"),       // tf=2, dl=8 — loses to 2 on length
      (4L, "vector x x x"),                // rare term, tf=1, dl=4 — beats 1 on idf
      (5L, "none of these words"))         // unmatched: absent from the ranking
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.bm25(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(5L))
    val score = out.view.mapValues(_._2).toMap
    assert(score(2L) > score(1L), "higher tf must win at equal length")
    assert(score(2L) > score(3L), "longer doc must lose at equal tf")
    assert(score(4L) > score(1L), "rarer term must win at equal tf and length")
    // pin the exact integer arithmetic of doc 1 against a scalar replica
    val (n, sumDl) = (5L, 24L)
    def lnq(m: Long): Long =
      math.floor(math.log(m.toDouble) * TextOps.BmScale + 0.5).toLong
    val idfQ = lnq(2 * n + 2) - lnq(2 * 3 + 1) // Lucene idf, df('hash') = 3
    val avgdl = sumDl.toDouble / n.toDouble
    val tfn = 1.0 * (TextOps.BmK1 + 1.0) /
      (1.0 + TextOps.BmK1 * (1.0 - TextOps.BmB + TextOps.BmB * 4.0 / avgdl))
    assert(score(1L) === math.floor(idfQ.toDouble * tfn + 0.5).toLong)
  }

  test("gopherRules: each rule trips on exactly its designed violator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    Seq(
      // A: 5 tokens -> fails wordcount; 0 stopwords -> fails stopword
      (1L, "s1", "one two three four five"),
      // B: 12 tokens, 4 stopword instances, no dominant token -> passes all
      (2L, "s1", "the cat sat upon and mat with the dog near and tree"),
      // C: 'spam' is 5/12 tokens (5*5 > 12) -> fails repetition only
      (3L, "s1", "spam spam spam spam spam and the cat sat mat dog tree"),
      // D: 10/12 tokens digit-only (5*2 < 4*12) -> fails alpha only
      (4L, "s1", "111 222 333 444 555 666 777 888 999 000 the and"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.gopherRules(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "s1")
    assert(row.getLong(1) === 4L)       // n_docs
    assert(row.getLong(2) === 1L)       // wordcount: A
    assert(row.getLong(3) === 0L)       // avglen: none (D sits exactly on 3n)
    assert(row.getLong(4) === 1L)       // stopword: A
    assert(row.getLong(5) === 1L)       // repetition: C
    assert(row.getLong(6) === 1L)       // alpha: D
    assert(row.getLong(7) === 1L)       // pass: B only
    assert(row.getDouble(8) === 0.25)
  }

  test("contentChunks: chunks re-align across an insertion; fixed stride cannot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    // 40 shared tokens; doc 2 prepends one token. Content-decided
    // boundaries re-align after the first boundary past the insertion,
    // so the shared suffix dedups; docChunks' fixed 50-token windows see
    // two different strings and find nothing.
    val shared = (1 to 40).map(i => s"w${i * 7 % 13}tok$i").mkString(" ")
    Seq((1L, shared), (2L, s"zzz $shared"), (3L, shared))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val groups = TextOps.contentChunks(spark, dir).collect()
    // identical docs 1 and 3 guarantee shared groups; the insertion pair
    // must ALSO share at least one re-aligned chunk
    val multiDoc = groups.filter(_.getLong(3) >= 2)
    assert(multiDoc.nonEmpty)
    val tripled = groups.filter(_.getLong(2) >= 3) // chunk in docs 1, 2 AND 3
    assert(tripled.nonEmpty, "no chunk re-aligned across the insertion")
    groups.foreach { g =>
      assert(g.getLong(5) === (g.getLong(2) - 1L) * g.getLong(1)) // tokens_saved
      assert(g.getLong(4) === 1L) // keep_doc_id: min doc wins
    }
    // the fixed-stride twin finds no cross-doc duplicate for the pair
    val fixedDir = java.nio.file.Files.createTempDirectory("graft-cdc2").toString
    Seq((1L, shared), (2L, s"zzz $shared"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixedDir/documents.parquet")
    assert(TextOps.chunkDedup(spark, fixedDir).count() === 0L)
  }

  test("winnow: per-doc selection matches a scalar winnowing replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    val texts = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "x y z"))   // 1 gram < W: no full window, absent from output
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    def replica(text: String): Option[(Long, Long, Long, Double)] = {
      val t = text.split(" ")
      val ghs = (0 to t.length - 3).map(i => h32(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
      val n = ghs.length
      if (n < TextOps.WinnowW) None else {
        val picks = (0 to n - TextOps.WinnowW).map { p =>
          val win = (p until p + TextOps.WinnowW).map(i => (ghs(i), i))
          win.minBy { case (h, i) => (h, -i) } // rightmost min
        }.distinct
        Some((n.toLong, picks.size.toLong, picks.map(_._1).distinct.size.toLong,
          picks.size.toDouble / (n - (TextOps.WinnowW - 1)).toDouble))
      }
    }
    val got = TextOps.winnow(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(!got.contains(3L))
    for (id <- Seq(1L, 2L)) {
      val Some(exp) = replica(texts.find(_._1 == id).get._2)
      assert(got(id) === exp)
    }
  }

  test("topicWords: designed distinctive terms win their sources") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-topic").toString
    Seq(
      (1L, "a", "apple apple apple common common"),
      (2L, "b", "banana banana banana common common"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.topicWords(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("a", 1))._1 === "apple")
    assert(got(("b", 1))._1 === "banana")
    // replica of the quantized log-odds for apple in a: c_sw=3, c_rest=0,
    // n_s=5, n_rest=5
    def lq(m: Long): Long =
      math.floor(math.log(m.toDouble) * TextOps.BmScale + 0.5).toLong
    val expQ = lq((3 + 1) * (5 - 0 + 1)) - lq((0 + 1) * (5 - 3 + 1))
    assert(got(("a", 1))._4 === expQ.toDouble / TextOps.BmScale)
    assert(got(("a", 1))._4 > 0.0)
    // the shared term never outranks the distinctive one
    assert(got(("a", 1))._2 === 3L && got(("a", 1))._3 === 0L)
  }

  test("noveltyCurve: new bigram types land in their first bucket only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-novel").toString
    // ids 0..9 -> bucket == id; every doc repeats 'a b' except doc 5
    val rows = (0L to 9L).map(i => (i, if (i == 5) "c d" else "a b"))
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.noveltyCurve(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === (0L to 9L).toSet)
    assert(got(0L) === ((1L, 1L, 1L)))   // 'a b' first seen
    assert(got(5L) === ((1L, 1L, 1L)))   // 'c d' first seen
    (1L to 9L).filter(_ != 5L).foreach(b => assert(got(b) === ((1L, 1L, 0L))))
  }

  test("zipfFit: exact replica on distinct frequencies; slope -1 on 1/rank") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    // freqs 24/rank: 24, 12, 8, 6 — an exact Zipf(1) profile
    val text = Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")
    Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.zipfFit(spark, dir).collect().head
    assert(r.getLong(0) === 4L)
    // scalar replica of the quantized log-log OLS (m = 1 per freq)
    def lq(m: Long): Double =
      math.floor(math.log(m.toDouble) * TextOps.BmScale + 0.5)
    val pts = Seq(24L, 12L, 8L, 6L).zipWithIndex.map { case (f, i) =>
      (lq(2L * i + 2L), lq(2L * f)) // doubled midrank 2R+m+1 = 2i+2
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getDouble(1) === slope)
    assert(r.getDouble(2) === -slope)
    assert(math.abs(slope + 1.0) < 1e-4) // Zipf exponent ~ 1
  }

  test("heapsFit: exact replica of the cumulative log-log fit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    // doc i = "t{i} base": each bucket adds exactly one new type;
    // N_b = 2(b+1), V_b = b+2
    val rows = (0L to 9L).map(i => (i, s"t$i base"))
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.heapsFit(spark, dir).collect().head
    assert(r.getLong(0) === 10L)
    def lq(m: Long): Double =
      math.floor(math.log(m.toDouble) * TextOps.BmScale + 0.5)
    val pts = (0 to 9).map(b => (lq(2L * (b + 1)), lq(b + 2L)))
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getDouble(1) === beta)
    assert(beta > 0.0 && beta < 1.0) // sub-linear vocabulary growth
    assert(r.getDouble(2) === ((sy - beta * sx) / n) / TextOps.BmScale)
  }

  test("bpeTrain: hand-folded merges on the classic aaab/ab vocabulary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // vocab: aaab x3, ab x2.
    // round 1: (a,a) = 2*3 = 6 beats (a,b) = 3+2 = 5 -> merge aa;
    //   greedy left-to-right: |a|a|a|b -> |aa|a|b (never |a|aa|b)
    // round 2: (a,b) = 3+2 = 5 beats (aa,a) = 3 -> merge ab
    // round 3: (aa,ab) = 3 is the only pair left -> merge aaab
    Seq((1L, "aaab aaab ab"), (2L, "aaab ab"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.bpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("bpeFertility: merges serve one source fully, ration the other") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fert").toString
    // sx: "aaaa" x10 — merges 1-2 ((a,a), (aa,aa)) collapse it to ONE
    // token. sy: "bcdefgh" x1 — its 6 cnt-1 pairs compete for the 4
    // remaining rounds; greedy (cnt DESC, l, r) takes (b,c), (bc,d),
    // (bcd,e), (bcde,f), leaving |bcdef|g|h = 3 tokens
    val docs = Seq(
      (1L, Seq.fill(10)("aaaa").mkString(" "), "sx"),
      (2L, "bcdefgh", "sy"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.bpeFertility(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "sx" -> ((10L, 10L, 1.0, 4.0)),
      "sy" -> ((1L, 3L, 3.0, 7.0 / 3.0))))
  }

  test("bpeEncode: per-doc encoding, hand-checked and fertility-consistent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    // the bpeFertility fixture corpus: merges collapse "aaaa" to 1 token
    // (rounds 1-2) and "bcdefgh" to |bcdef|g|h = 3 (rounds 3-6)
    val docs = Seq(
      (1L, Seq.fill(10)("aaaa").mkString(" "), "sx"),
      (2L, "bcdefgh", "sy"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === Map(
      1L -> ((10L, 10L, 1.0, 4.0)),
      2L -> ((1L, 3L, 3.0, 7.0 / 3.0))))
    // corpus totals equal the per-source fertility totals (one model,
    // two reports — they may not drift)
    val sf001 = "/root/testdata/sf0.001"
    val enc = TextOps.bpeEncode(spark, sf001)
      .agg(sum("n_ws_tokens"), sum("n_bpe_tokens")).head()
    val fert = TextOps.bpeFertility(spark, sf001)
      .agg(sum("n_word_occurrences"), sum("n_tokens")).head()
    assert(enc.getLong(0) === fert.getLong(0))
    assert(enc.getLong(1) === fert.getLong(1))
  }

  test("plagiarismPairs: shared passage pairs up, df-capped boilerplate cannot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plag").toString
    // docs 1 and 2 share a 20-token passage behind different framings —
    // winnowing guarantees shared fingerprints for any run >= w+k-1 = 6
    // tokens, so the pair must surface with n_shared >= PlagMinShared.
    // docs 3..12 share ONLY a 7-token boilerplate phrase: its fingerprint
    // hashes occur in 10 > PlagMaxDf docs, so the cap suppresses every
    // boilerplate-only pair.
    val passage = (1 to 20).map(i => s"run$i").mkString(" ")
    val boiler = "please accept all cookie terms before reading"
    val docs = Seq(
      (1L, s"intro alpha beta $passage outro gamma"),
      (2L, s"different start $passage another ending here")) ++
      (3L to 12L).map(i => (i, s"$boiler unique${i}a unique${i}b unique${i}c"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.plagiarismPairs(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getLong(2) >= TextOps.PlagMinShared)
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("sourceKl: matches a scalar replica over the smoothed shared vocab") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skl").toString
    // A = {x:2, y:1} (n=3), B = {x:1, z:1} (n=2), V = 3
    Seq((1L, "x x y", "A"), (2L, "x z", "B"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def lnq(m: Long): Long =
      math.floor(math.log(m.toDouble) * (1L << 20) + 0.5).toLong
    def klq(ca: Map[String, Long], na: Long, cb: Map[String, Long], nb: Long): Double = {
      val v = 3L
      val s = Seq("x", "y", "z").map { t =>
        val ia = ca.getOrElse(t, 0L) + 1; val ib = cb.getOrElse(t, 0L) + 1
        ia * (lnq(ia * (nb + v)) - lnq(ib * (na + v)))
      }.sum
      s.toDouble / (na + v).toDouble / (1L << 20).toDouble
    }
    val a = Map("x" -> 2L, "y" -> 1L); val b = Map("x" -> 1L, "z" -> 1L)
    val got = TextOps.sourceKl(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === Set(("A", "B"), ("B", "A")))
    assert(got(("A", "B")) === ((3L, 2L, klq(a, 3, b, 2))))
    assert(got(("B", "A")) === ((2L, 3L, klq(b, 2, a, 3))))
    // Gibbs: smoothed KL stays non-negative (up to log quantization)
    assert(got.values.forall(_._3 > -1e-6))
  }

  test("lshTuning: identical docs collide in every config, bucket math exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsht").toString
    // docs 1 and 2 share ALL tokens (identical 12-signature rows), doc 3
    // is disjoint: every config has exactly b collision buckets of size 2
    // (one per band), b·1 candidate pairs, 2b buckets, and folds doc 2
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta eps zeta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.lshTuning(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length === TextOps.LshConfigs.length)
    for ((b, r, nb, nc, cp, nd) <- got) {
      assert(b * r === 12)
      assert(nb === 2L * b, s"config ($b,$r)")
      assert(nc === b.toLong && cp === b.toLong && nd === 1L, s"config ($b,$r)")
    }
    // the sweep's defining monotonicity: more rows per band, fewer
    // candidates (measured on the real corpus, where configs differ)
    val corpus = TextOps.lshTuning(spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getInt(1)).map(_.getLong(4))
    assert(corpus.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("nbClassify: learns a separable fixture; unseen tokens fall to the prior") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    // train (even ids): en doc "apple apple banana", de doc "kirsche banana"
    // -> c(apple)=(2,0), c(banana)=(1,1), c(kirsche)=(0,1); t1=3 t0=2 v=3;
    //    priors 1/1 cancel exactly (lnq(1)-lnq(1)=0)
    // test (odd ids): "apple" -> lnq3 - (lnq6-lnq5) > 0 -> en (tp);
    //   "kirsche kirsche" -> 2(-lnq2) - 2(lnq6-lnq5) < 0 -> not-en (tn);
    //   "mango" unseen -> score = prior = 0 -> not-en (tn)
    Seq(
      (0L, "en", "apple apple banana"),
      (2L, "de", "kirsche banana"),
      (1L, "en", "apple"),
      (3L, "de", "kirsche kirsche"),
      (5L, "de", "mango"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.nbClassify(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 3L, 3L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      === ((1L, 0L, 0L, 2L)))
    assert(r.getDouble(7) === 1.0)   // accuracy
    assert(r.getDouble(10) === 1.0)  // f1

    // the evaluation siblings on the same fixture: scores rank the en
    // doc first (s > 0), the unseen-token doc at the prior (0), the
    // kirsche doc last (negative) — n = 3 puts them in deciles 0, 3, 6
    val lift = TextOps.liftCurve(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5)))).toMap
    assert(lift(0L) === ((1L, 1L, 1L, 3.0, 1.0))) // top decile: all signal
    assert(lift(3L) === ((1L, 0L, 1L, 0.0, 1.0)))
    assert(lift(6L) === ((1L, 0L, 1L, 0.0, 1.0)))
    // perfect separation: D = 1 at the prior score 0 (the smallest score
    // attaining the max deviation)
    val ks = TextOps.ksClassifier(spark, dir).collect()(0)
    assert((ks.getLong(0), ks.getLong(1), ks.getLong(2), ks.getLong(3),
      ks.getDouble(4)) === ((1L, 2L, 0L, 2L, 1.0)))
    // McNemar vs the stopword heuristic: no fixture token is a stopword,
    // so langid predicts 'und' everywhere — right on the two non-en docs
    // by accident, wrong on the en doc; NB is right on all three.
    // Cells (NB row-correct first): n11=2, n10=1, n01=0, n00=0;
    // chi2_cc = max(|1-0|-1, 0)^2 / 1 = 0
    val mc = TextOps.mcnemar(spark, dir).collect()(0)
    assert((mc.getLong(0), mc.getLong(1), mc.getLong(2), mc.getLong(3),
      mc.getLong(4), mc.getDouble(5)) === ((3L, 2L, 1L, 0L, 0L, 0.0)))
    // AUC on the same separable fixture: the one positive outranks both
    // negatives -> U = 2, U*2 = 4, AUC = 4/(2*1*2) = 1, Gini = 1
    val auc = TextOps.aucRoc(spark, dir).collect()(0)
    assert((auc.getLong(0), auc.getLong(1), auc.getDouble(2),
      auc.getDouble(3), auc.getDouble(4)) === ((1L, 2L, 4.0, 1.0, 1.0)))
  }

  test("aucFrom: Mann-Whitney identity with half-credited ties, by hand") {
    import spark.implicits._
    // scores: pos {2, 1}, neg {1, 0}. Pairs: 2>1, 2>0, 1=1 (half), 1>0
    // -> U = 3.5, U*2 = 7, AUC = 7/8 = 0.875, Gini = 0.75
    val s = Seq((2L, 1L), (1L, 1L), (1L, 0L), (0L, 0L)).toDF("v", "y")
    val r = TextOps.aucFrom(s).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 7.0)))
    assert(r.getDouble(3) === 0.875 && r.getDouble(4) === 0.75)
    // degenerate single-class frames: AUC is NULL (n1*n0 = 0), never a
    // divide-by-zero
    val one = Seq((5L, 1L), (3L, 1L)).toDF("v", "y")
    assert(TextOps.aucFrom(one).collect()(0).isNullAt(3))
  }

  test("readability: count heuristics and Flesch formula by hand") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, y) = (r.getAs[Long]("words"), r.getAs[Long]("sentences"),
        r.getAs[Long]("syllables"))
      assert(w > 0 && s > 0 && y > 0)
      val wps = w.toDouble / s
      val spw = y.toDouble / w
      assert(r.getAs[Double]("words_per_sentence") === wps)
      assert(r.getAs[Double]("flesch") === 206.835 - 1.015 * wps - 84.6 * spw)
    }
    // the three regex counts, pinned on hand strings through the same
    // expressions the operator uses
    val probe = spark.createDataFrame(Seq(
      // 6 words; "Hi there. It works! Right?" -> 3 terminator runs;
      // vowel groups: i, e, e, i, o, i (y counts as a vowel) -> 7 with "works"->o; count below
      (1L, "Hi there. It works! Right?", "s1"),
      (2L, "no terminator here", "s1")
    )).toDF("doc_id", "text", "source").select(
      size(split(lower(trim(col("text"))), "\\s+")).as("w"),
      greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))).as("s"),
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).as("y"))
      .collect()
    assert(probe(0).getInt(0) === 5 && probe(0).getInt(1) === 3)
    // vowel groups: hi=1, there=2 (e,e split by r), it=1, works=1, right=1
    assert(probe(0).getInt(2) === 6)
    assert(probe(1).getInt(1) === 1) // sentence floor
  }
}

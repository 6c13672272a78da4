package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Properties of the corpus-curation operators (quota, mixture, repetition)
  * and the connected-component dedup clustering, over driver testdata.
  */
class CurationOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("source quota: at most K docs per source, ranked by length then id") {
    val out = CurationOps.sourceQuota(spark, sf).cache()
    val perSource = out.groupBy("source").agg(count(lit(1)).as("n"),
      max("quota_rank").as("max_rank"))
    assert(perSource.filter(col("n") > 10).count() === 0)
    assert(perSource.filter(col("max_rank") =!= col("n")).count() === 0)
    // kept docs dominate dropped docs of the same source by (n_chars, -id)
    val dropped = Tables.documents(spark, sf)
      .join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(max("n_chars").as("max_dropped_chars"))
    val kept = out.groupBy("source").agg(min("n_chars").as("min_kept_chars"))
    assert(kept.join(dropped, Seq("source"))
      .filter(col("max_dropped_chars") > col("min_kept_chars")).count() === 0)
    out.unpersist()
  }

  test("mixture sample: deterministic, rate-bounded, and re-run-stable") {
    val a = CurationOps.mixtureSample(spark, sf).collect().toSeq
    val b = CurationOps.mixtureSample(spark, sf).collect().toSeq
    assert(a === b) // no RNG: identical composition across runs
    assert(a.forall(r => r.getAs[Long]("u") < r.getAs[Long]("keep_rate")))
  }

  test("repetition stats: fractions bounded, gate consistent with thresholds") {
    val out = CurationOps.repetitionStats(spark, sf).cache()
    assert(out.filter(col("top_token_frac") <= 0 || col("top_token_frac") > 1).count() === 0)
    assert(out.filter(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1).count() === 0)
    assert(out.filter(
      (col("passes_repetition") === 1) =!=
        (col("top_token_frac") <= 0.3 && col("dup_bigram_frac") <= 0.5)).count() === 0)
    // a doc's token count matches its array length (join vs raw table)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("len"))
    assert(out.join(lens, Seq("doc_id"))
      .filter(col("n_tokens") =!= col("len")).count() === 0)
    out.unpersist()
  }

  test("repetition stats: 1-token docs keep a row with NULL bigram fraction") {
    // the oracle's per-row arithmetic yields (n_bigrams=0, frac=NULL,
    // passes=0) for a 1-token doc — the Spark side must agree instead of
    // dropping the doc at the bigram join (verified against DuckDB)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdocs").toString
    Seq(
      (0L, "solo", "en", "s", 4L),
      (1L, "two words", "en", "s", 9L),
      (2L, "a a a", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CurationOps.repetitionStats(spark, dir)
      .orderBy("doc_id").collect()
    assert(rows.length === 3, "the 1-token doc must not drop out")
    val solo = rows(0)
    assert(solo.getAs[Long]("n_bigrams") === 0L)
    assert(solo.isNullAt(solo.fieldIndex("dup_bigram_frac")))
    assert(solo.getAs[Int]("passes_repetition") === 0)
    val rep = rows(2) // "a a a": 2 bigrams, 1 distinct -> 0.5 dup fraction
    assert(rep.getAs[Double]("dup_bigram_frac") === 0.5)
  }

  test("two-phase salted quota == single-window quota, rows and ranks") {
    val single = CurationOps.sourceQuota(spark, sf).collect().toSeq
    val two = CurationOps.sourceQuotaTwoPhase(spark, sf).collect().toSeq
    assert(two === single)
  }

  test("dedupe-then-pair fuzzy match == naive per-row pairwise form") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), lower(col("p_name")).as("name"))
      .withColumn("blk", element_at(split(col("name"), " "), 1))
      .withColumn("nlen",
        when(size(split(col("name"), " ")) >= 2,
          length(element_at(split(col("name"), " "), 2))).otherwise(lit(0)))
    val naive = parts.select(col("p_partkey").as("k_a"), col("name").as("n_a"),
        col("blk"), col("nlen"))
      .join(parts.select(col("p_partkey").as("k_b"), col("name").as("n_b"),
        col("blk"), col("nlen")), Seq("blk", "nlen"))
      .filter(col("k_a") < col("k_b"))
      .filter(levenshtein(col("n_a"), col("n_b")) <= 2)
      .groupBy(col("blk"), col("nlen"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((levenshtein(col("n_a"), col("n_b")) === 0).cast("int")).cast("long").as("n_exact"))
      .orderBy(col("blk"), col("nlen"))
      .collect().toSeq
    assert(CurationOps.fuzzyMatch(spark, sf).collect().toSeq === naive)
    assert(naive.nonEmpty)
  }

  test("indel fuzzy match == UNBANDED naive pairwise form (band drops nothing)") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), lower(col("p_name")).as("name"))
      .withColumn("blk", element_at(split(col("name"), " "), 1))
    val naive = parts.select(col("p_partkey").as("k_a"), col("name").as("n_a"), col("blk"))
      .join(parts.select(col("p_partkey").as("k_b"), col("name").as("n_b"), col("blk")),
        Seq("blk"))
      .filter(col("k_a") < col("k_b"))
      .filter(levenshtein(col("n_a"), col("n_b")) <= 2)
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((levenshtein(col("n_a"), col("n_b")) === 0).cast("int")).cast("long").as("n_exact"),
        sum((length(col("n_a")) =!= length(col("n_b"))).cast("int")).cast("long").as("n_indel"))
      .orderBy(col("blk"))
      .collect().toSeq
    val banded = CurationOps.fuzzyMatchIndel(spark, sf).collect().toSeq
    assert(banded === naive)
    assert(naive.nonEmpty)
  }

  test("indel fuzzy match pairs insert/delete typos the exact-length block misses") {
    // the generated p_name corpus happens to contain ZERO length-changing
    // lev<=2 pairs (checked at sf0.001/0.01/0.1), so the oracle entry proves
    // band exactness but not the indel path — this fixture does: one
    // insertion typo and one space-shift typo, both invisible to the
    // (first word, exact second-word length) block
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzyparts").toString
    Seq(
      (1L, "alpha brush metal"),   // base
      (2L, "alpha brushy metal"),  // insertion: lev 1, 2nd-word len 5 -> 6
      (3L, "alpha brush metal"),   // exact duplicate of 1
      (4L, "alpha brash metal"),   // substitution: lev 1, same lengths
      (5L, "alpha brus hmetal"),   // space shift: lev 2, TOTAL len unchanged
      (6L, "beta lace"),
      (7L, "beta lacquered"))      // len diff 5: never a lev<=2 pair
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = CurationOps.fuzzyMatchIndel(spark, dir).collect()
    val alpha = out.find(_.getAs[String]("blk") == "alpha").get
    // pairs among {1,2,3,4,5}: (1,3) exact; (1,4),(3,4) substitution;
    // (1,2),(2,3) insertion [indel]; (2,4) lev 2 [indel]; (1,5),(3,5) space
    // shift lev 2; (4,5) lev 3 no; (2,5) lev 3 no => 8 pairs, 3 indel
    assert(alpha.getAs[Long]("n_pairs") === 8L)
    assert(alpha.getAs[Long]("n_exact") === 1L)
    assert(alpha.getAs[Long]("n_indel") === 3L)
    assert(!out.exists(_.getAs[String]("blk") == "beta"))
    // the substitution-only block on the same fixture finds strictly fewer:
    // it misses all three indel pairs AND the space-shift pairs (nlen moves)
    val subOnly = CurationOps.fuzzyMatch(spark, dir).collect()
      .map(_.getAs[Long]("n_pairs")).sum
    assert(subOnly === 3L, "exact-nlen block should see only (1,3),(1,4),(3,4)")
  }

  test("seq pack: fixture assignment is exact, straddlers stay where they start") {
    import spark.implicits._
    def txt(n: Int) = Seq.fill(n)("tok").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-pack").toString
    Seq(
      (1L, "s1", txt(100)), // cum_excl 0   -> pack 0, offset 0
      (2L, "s1", txt(100)), // cum_excl 100 -> pack 0, offset 100
      (3L, "s1", txt(100)), // cum_excl 200 -> pack 0 (straddles 256), offset 200
      (4L, "s1", txt(50)),  // cum_excl 300 -> pack 1, offset 44
      (5L, "s2", txt(10)))  // own source: pack 0, offset 0
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.seqPack(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))).toMap
    assert(got === Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 100L)), 3L -> ((0L, 200L)),
      4L -> ((1L, 44L)), 5L -> ((0L, 0L))))
  }

  test("seq pack: offsets bounded by the budget, packs contiguous per source") {
    val out = CurationOps.seqPack(spark, sf).cache()
    assert(out.filter(col("pack_offset") < 0 || col("pack_offset") >= 256).count() === 0)
    // recompute the running sum independently: pack_id must be the
    // exclusive-prefix div and pack ids never decrease within a source
    val perSource = out.orderBy("source", "doc_id").collect()
      .groupBy(_.getAs[String]("source"))
    for ((_, rows) <- perSource) {
      var cum = 0L
      var lastPack = 0L
      for (r <- rows) {
        assert(r.getAs[Long]("pack_id") === cum / 256)
        assert(r.getAs[Long]("pack_offset") === cum % 256)
        assert(r.getAs[Long]("pack_id") >= lastPack)
        lastPack = r.getAs[Long]("pack_id")
        cum += r.getAs[Int]("n_tokens")
      }
    }
    out.unpersist()
  }

  test("lm familiarity: fixture model is exact; scores bounded on the corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    // corpus LM: c2(ab)=3 ba=1 bc=1 cc=1; contexts c1(a)=3 b=2 c=1
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c c"), (4L, "solo"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.lmFamiliarity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_bg_count"),
          r.getAs[Long]("sum_ctx_count"), r.getAs[Double]("familiarity")))).toMap
    // d1 = ab,ba,ab -> (3+1+3)/(3+2+3); d2 = ab,bc -> 4/5; d3 = cc -> 1/1;
    // the 1-token doc has no bigrams and is absent
    assert(got === Map(
      1L -> ((3L, 7L, 8L, 0.875)),
      2L -> ((2L, 4L, 5L, 0.8)),
      3L -> ((1L, 1L, 1L, 1.0))))
    val corpus = CurationOps.lmFamiliarity(spark, sf)
    assert(corpus.filter(col("familiarity") <= 0 || col("familiarity") > 1).count() === 0)
  }

  test("dsir weights: fixture ratio is exact; null iff no target evidence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    // target LM = doc1 (en): c2_t(ab)=2 ba=1; c1_t(a)=2 b=1
    // raw LM = all: c2(ab)=3 ba=1 bc=1 cc=1 xy=1; c1(a)=3 b=2 c=1 x=1
    Seq((1L, "a b a b", "en"), (2L, "a b c", "fr"),
        (3L, "c c", "fr"), (4L, "x y", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.dsirWeights(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_matched_target"),
          r.getAs[Double]("fam_raw"),
          Option(r.getAs[java.lang.Double]("dsir_weight")).map(_.toDouble)))).toMap
    // d1 = ab,ba,ab: raw 7/8, target (2+1+2)/(2+1+2)=1 -> w = 1/(7/8)
    // d2 = ab,bc: raw 4/5, target matches only ab: 2/2=1 -> w = 1/(4/5)
    // d3 = cc, d4 = xy: no target bigram -> NULL weight, reported not dropped
    assert(got === Map(
      1L -> ((3L, 3L, 0.875, Some(1.0 / 0.875))),
      2L -> ((2L, 1L, 0.8, Some(1.25))),
      3L -> ((1L, 0L, 1.0, None)),
      4L -> ((1L, 0L, 1.0, None))))
    // corpus invariants: weight is NULL exactly when no bigram matched the
    // target model; an en doc's bigrams are target-model members by
    // construction; familiarities stay in (0, 1]
    val corpus = CurationOps.dsirWeights(spark, sf).cache()
    assert(corpus.filter(col("dsir_weight").isNull =!=
      (col("n_matched_target") === 0)).count() === 0)
    assert(corpus.filter(col("lang") === "en")
      .filter(col("n_matched_target") =!= col("n_bigrams")).count() === 0)
    assert(corpus.filter(col("fam_raw") <= 0 || col("fam_raw") > 1).count() === 0)
    assert(corpus.filter(col("fam_target") <= 0 || col("fam_target") > 1).count() === 0)
    corpus.unpersist()
  }

  test("data split: complete, roughly 90/5/5, and append-stable") {
    val out = CurationOps.dataSplit(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf).count()
    assert(out.count() === total)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    // hash buckets are uniform-ish; at 500 docs allow wide slack
    assert(bySplit("train").toDouble / total > 0.8)
    assert(bySplit.getOrElse("valid", 0L) + bySplit.getOrElse("test", 0L) > 0)
    // append-stability: splitting a PHYSICALLY different (half-size) corpus
    // assigns every common doc identically — per-doc hashing depends on
    // nothing but the doc itself, the property a random()/ordered/sampled
    // split breaks the moment a batch is appended
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val reSplit = CurationOps.dataSplit(spark, dir)
      .select(col("doc_id"), col("split").as("split2"))
    assert(reSplit.count() > 0)
    assert(out.join(reSplit, "doc_id")
      .filter(col("split") =!= col("split2")).count() === 0)
    out.unpersist()
  }

  test("priority sample: exact top-k of an independently recomputed priority order") {
    // independent reimplementation: JDK md5, plain doubles — the same
    // arithmetic contract the DuckDB oracle relies on, derived without
    // touching the Spark expression tree
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val all = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = all
      .map { case (id, src, w) =>
        (id, src, w, w.toDouble * 4294967296.0 / (h32(s"prio_$id") + 1).toDouble)
      }
      .sortBy { case (id, _, _, p) => (-p, id) }
      .take(30).toSeq
    val q = CurationOps.prioritySample(spark, sf)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // the scale contract: global top-k is TakeOrdered (per-partition heaps
    // merged on the driver), never a single-partition global sort
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("curation pipeline: every survivor passes each stage's own gate") {
    val out = CurationOps.curationPipeline(spark, sf).cache()
    assert(out.count() > 0, "pipeline must keep something at this SF")
    // stage 1: survivors are exact-dedup representatives
    val keepers = TextOps.dedupExact(spark, sf)
      .filter(col("doc_id") === col("keep_doc_id")).select("doc_id")
    assert(out.join(keepers, Seq("doc_id"), "left_anti").count() === 0)
    // stage 2: survivors pass the repetition gate
    val passing = CurationOps.repetitionStats(spark, sf)
      .filter(col("passes_repetition") === 1).select("doc_id")
    assert(out.join(passing, Seq("doc_id"), "left_anti").count() === 0)
    // stage 3+4: quota bound holds and the mixture hash admitted the doc
    assert(out.filter(col("quota_rank") > 10).count() === 0)
    val mix = CurationOps.mixtureSample(spark, sf).select("doc_id")
    assert(out.join(mix, Seq("doc_id"), "left_anti").count() === 0)
    out.unpersist()
  }

  test("connected components: fixpoint on the band graph, min-labeled") {
    val comp = TextOps.dedupCC(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(comp.count() === n)
    // component_id is a member of the component and is its minimum
    val minPerComp = comp.groupBy("component_id").agg(min("doc_id").as("min_doc"))
    assert(minPerComp.filter(col("component_id") =!= col("min_doc")).count() === 0)
    // fixpoint: any two docs sharing a (band_id, band_key) bucket share a component
    val banded = TextOps.minhashBands(spark, sf)
    val pairs = banded.select(col("band_id"), col("band_key"), col("doc_id").as("a"))
      .join(banded.select(col("band_id"), col("band_key"), col("doc_id").as("b")),
        Seq("band_id", "band_key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val viol = pairs
      .join(comp.select(col("doc_id").as("a"), col("component_id").as("ca")), Seq("a"))
      .join(comp.select(col("doc_id").as("b"), col("component_id").as("cb")), Seq("b"))
      .filter(col("ca") =!= col("cb"))
    assert(viol.count() === 0)
    // CC coarsens bucket-min: every bucket-min cluster maps into ONE component
    val bucketMin = TextOps.dedupMinhash(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
    val split = bucketMin.join(comp, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(countDistinct("component_id").as("n_comps"))
      .filter(col("n_comps") > 1)
    assert(split.count() === 0)
    comp.unpersist()
  }

  test("group exemplars: k per stratum, hash-rank order, stable across runs") {
    val sf = "/root/testdata/sf0.001"
    val rows = CurationOps.groupExemplars(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).values.foreach { g =>
      assert(g.length <= 2 && g.map(_._3).sorted.toSeq === (1L to g.length))
    }
    // hash-rank, not id-rank: the chosen exemplars must differ from a
    // plain lowest-doc_id pick in at least one stratum (else the hash
    // buys nothing) — deterministic on this corpus, pinned here
    val byId = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sorted.take(2).toSet).toMap
    val byHash = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._4).toSet).toMap
    assert(byId.keySet === byHash.keySet)
    assert(byId.exists { case (k, ids) => byHash(k) != ids })
    // stability: a second run returns the identical selection
    val again = CurationOps.groupExemplars(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("tokenBudget: prefix rule — crossing doc drops the rest of the source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-budget").toString
    def words(k: Int): String = Seq.fill(k)("w").mkString(" ")
    // priority order is n_chars DESC: 800 + 600 fit (cum 1400 <= 1500);
    // the 300-token doc crosses (1700) and the 50-token doc AFTER it
    // would fit a knapsack but not the prefix rule
    Seq(
      (1L, "s", 400L, words(800)),
      (2L, "s", 300L, words(600)),
      (3L, "s", 200L, words(300)),
      (4L, "s", 100L, words(50)))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationOps.tokenBudget(spark, dir).collect()
    assert(r.length === 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4)) ===
      ((4L, 1750L, 2L, 1400L)))
    assert(r(0).getDouble(5) === 1400.0 / CurationOps.TokenBudget)
  }

  test("diverseTopk: one representative per cluster, short docs stay singletons") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-diverse").toString
    Seq(
      // identical texts => identical min shingle hash => one cluster
      (1L, "s", 100L, "alpha beta gamma delta"),
      (2L, "s", 90L,  "alpha beta gamma delta"),
      (3L, "s", 80L,  "completely different words here"),
      // sub-3-token doc: unshingleable, falls back to its own cluster
      (4L, "s", 10L,  "one two"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CurationOps.diverseTopk(spark, dir).collect()
      .map(r => r.getInt(1) -> r.getLong(2))
    // doc 2 (the duplicate) is collapsed; ranks re-pack 1..3
    assert(rows.toSeq === Seq(1 -> 1L, 2 -> 3L, 3 -> 4L))
  }

  test("ccnetBuckets: balanced NTILE fill and head>=middle>=tail ordering") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ccnet").toString
    // 7 scorable docs in 'en' (ntile sizes 3,2,2), 2 in 'fr' (1,1,0 -> the
    // fr tail bucket is absent, which the spec asserts too)
    val en = (1 to 7).map(i => (i.toLong, "en", s"alpha beta w$i gamma delta w${i + 1}"))
    val fr = Seq((8L, "fr", "le chat noir"), (9L, "fr", "le chien blanc"))
    (en ++ fr).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationOps.ccnetBuckets(spark, dir).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        ((row.getLong(2), row.getDouble(4), row.getDouble(5)))).toMap
    assert(r(("en", "head"))._1 === 3L)
    assert(r(("en", "middle"))._1 === 2L)
    assert(r(("en", "tail"))._1 === 2L)
    assert(r(("fr", "head"))._1 === 1L)
    assert(r(("fr", "middle"))._1 === 1L)
    assert(!r.contains(("fr", "tail")))
    // DESC score order: head's min familiarity >= middle's max >= tail's max
    assert(r(("en", "head"))._2 >= r(("en", "middle"))._3)
    assert(r(("en", "middle"))._2 >= r(("en", "tail"))._3)
  }

  test("domainWeights: exact uniform-target ratios and the cap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-domw").toString
    Seq(
      ("a", "t1 t2 t3"), ("a", "t4 t5 t6"),          // 6 tokens
      ("b", "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"), // 12 tokens
      ("c", "solo"))                                  // 1 token
      .toDF("source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationOps.domainWeights(spark, dir).collect()
      .map(row => row.getString(0) ->
        ((row.getLong(1), row.getLong(2), row.getDouble(3),
          row.getDouble(4), row.getDouble(5)))).toMap
    assert(r("a") === ((2L, 6L, 6.0 / 19.0, 19.0 / 18.0, 19.0 / 18.0)))
    assert(r("b") === ((1L, 12L, 12.0 / 19.0, 19.0 / 36.0, 19.0 / 36.0)))
    // c's raw weight 19/3 exceeds the cap
    assert(r("c") === ((1L, 1L, 1.0 / 19.0, 19.0 / 3.0, CurationOps.WeightCap)))
  }

  test("goldenRecord: drop-one word matching, survivorship, singleton exclusion") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-golden").toString
    // entity 1: three variants sharing "red blue" (canonical = the most
    // frequent "red blue green"); entity 2: two variants tied at m=1
    // (canonical = lexicographically smaller "one two four"); the
    // 5-row singleton must NOT appear (n_variants < 2)
    val parts = Seq.fill(3)("red blue green") ++ Seq("red blue teal") ++
      Seq.fill(2)("red blue verde") ++
      Seq("one two three", "one two four") ++
      Seq.fill(5)("alpha beta gamma")
    parts.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = CurationOps.goldenRecord(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("one two four", 2L, 2L),
      ("red blue green", 3L, 6L)))
  }

  test("entityVerify: chained member fails hub Jaccard and is expelled") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-entverify").toString
    // Chain A—B—C formed by drop-one blocking: A="red blue green" (m=3,
    // the canonical) matches B="red blue teal" on subset "red blue"; B
    // matches C="blue teal pink" on "blue teal"; A and C share only
    // "blue" (J = 1/5 < 1/3) so C is expelled by hub verification even
    // though transitive closure merged it. The clean pair survives whole.
    val parts = Seq.fill(3)("red blue green") ++ Seq("red blue teal") ++
      Seq("blue teal pink") ++
      Seq.fill(2)("one two three") ++ Seq("one two four") ++
      Seq.fill(4)("alpha beta gamma") // singleton, filtered (n_variants < 2)
    parts.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = CurationOps.entityVerify(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("one two three", 2L, 3L, 0L),
      ("red blue green", 2L, 4L, 1L)))
  }

  test("quantileNorm: unequal source sizes interpolate by exact index mapping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qnorm").toString
    // A = [10, 20, 30] (n=3), B = [100, 300] (n=2); floor-interpolated
    // indices: A's r reads B at ((r-1)·1) div 2 + 1 -> 1,1,2; B's r reads
    // A at ((r-1)·2) div 1 + 1 -> 1,3. Means computed by hand.
    Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "B", 100L), (5L, "B", 300L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.quantileNorm(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getDouble(4)))).toMap
    assert(got === Map(
      1L -> ((1, 55.0)),   // mean(10, 100)
      2L -> ((2, 60.0)),   // mean(20, 100)
      3L -> ((3, 165.0)),  // mean(30, 300)
      4L -> ((1, 55.0)),   // mean(10, 100)
      5L -> ((2, 165.0)))) // mean(30, 300)
    // after normalization both sources share the identical marginal
    val bySrc = CurationOps.quantileNorm(spark, dir).collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getDouble(4)).sorted.toSeq).toMap
    assert(bySrc("B").toSet.subsetOf(bySrc("A").toSet))
  }

  test("perplexityEval: hand-traced smoothing for seen, unseen-bigram, unseen-context") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl").toString
    // train (doc 0): "a b a b" -> c2 = {ab:2, ba:1}, ctx = {a:2, b:1}, V=2.
    // eval S (doc 1) "a b c": lp(ab) = lnq3 - lnq4 (seen), lp(bc) = 0 - lnq3
    // (unseen bigram, seen context) -> ce = lnq4 / 2 / 2^20.
    // eval S2 (doc 3) "z z": unseen context -> lp = -lnq2, ce = lnq2 / 2^20.
    Seq((0L, "a b a b", "S"), (1L, "a b c", "S"), (3L, "z z", "S2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def lnq(m: Long): Long =
      math.floor(math.log(m.toDouble) * (1L << 20) + 0.5).toLong
    val sc = (1L << 20).toDouble
    val got = CurationOps.perplexityEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("S", 1L, 2L, -(lnq(3) - lnq(4) - lnq(3)).toDouble / 2.0 / sc),
      ("S2", 1L, 1L, lnq(2).toDouble / sc)))
  }

  test("url canon: the canonicalization table, each axis alone and composed") {
    import spark.implicits._
    // (raw, expected canonical) — one row per noise axis + composites
    val cases = Seq(
      // identity: an already-canonical URL survives unchanged
      ("https://site.example/a/1?a=1&b=2", "https://site.example/a/1?a=1&b=2"),
      // scheme fold
      ("http://site.example/a/1", "https://site.example/a/1"),
      // host case
      ("https://SITE.Example/a/1", "https://site.example/a/1"),
      // www strip
      ("https://www.site.example/a/1", "https://site.example/a/1"),
      // default ports (both), non-default kept
      ("https://site.example:443/a/1", "https://site.example/a/1"),
      ("http://site.example:80/a/1", "https://site.example/a/1"),
      ("https://site.example:8443/a/1", "https://site.example:8443/a/1"),
      // index.html resolve + trailing slash
      ("https://site.example/a/1/index.html", "https://site.example/a/1"),
      ("https://site.example/a/1/", "https://site.example/a/1"),
      // tracking-param purge + key sort; fragment drop
      ("https://site.example/a/1?utm_source=f&b=2&a=1", "https://site.example/a/1?a=1&b=2"),
      ("https://site.example/a/1?b=2&a=1#frag", "https://site.example/a/1?a=1&b=2"),
      // query of ONLY tracking params collapses to no query at all
      ("https://site.example/a/1?utm_source=f&utm_campaign=c", "https://site.example/a/1"),
      // utm_ is a PREFIX compare, not a LIKE pattern: utmx is a real param
      ("https://site.example/a/1?utmx=1", "https://site.example/a/1?utmx=1"),
      // all axes at once
      ("HTTP://WWW.Site.Example:80/a/1/index.html?utm_source=f&b=2&a=1#s",
        "https://site.example/a/1?a=1&b=2"),
      // bare root: no path survives canonicalization
      ("http://www.site.example/", "https://site.example"))
    val got = cases.map(_._1).toDF("raw")
      .withColumn("canon", CurationOps.canonicalizeUrl(col("raw")))
      .select("canon").as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("url canon report: counts consistent and collapse is real") {
    val out = CurationOps.urlCanon(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (docs, raws, canons) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_raw_urls"), r.getAs[Long]("n_canonical_urls"))
      assert(canons <= raws && raws <= docs)
      // the derivation's noise axes guarantee real collapse per source
      assert(raws > canons)
      assert(math.abs(r.getAs[Double]("collapse_ratio")
        - raws.toDouble / canons) < 1e-12)
    }
  }

  test("crawl frontier: makespan law, delay bounds, queue totals") {
    val out = CurationOps.crawlFrontier(spark, sf).collect()
    assert(out.nonEmpty)
    val totalUrls = out.map(_.getAs[Long]("n_urls")).sum
    // one frontier row per host; queue totals cover every canonical URL
    val nCanon = CurationOps.urlCanon(spark, sf)
      .agg(sum(col("n_canonical_urls"))).head().getLong(0)
    assert(totalUrls === nCanon)
    out.foreach { r =>
      val (delay, n, makespan) = (r.getAs[Long]("delay_ms"),
        r.getAs[Long]("n_urls"), r.getAs[Long]("makespan_ms"))
      // per-host serial dispatch: k-th URL at (k-1)*delay, so the queue's
      // makespan is exactly (n-1)*delay
      assert(makespan === (n - 1) * delay)
      assert(delay >= CurationOps.CrawlBaseDelayMs &&
        delay < CurationOps.CrawlBaseDelayMs + CurationOps.CrawlDelaySpanMs)
      assert(r.getAs[String]("first_url").startsWith("https://"))
    }
  }
}

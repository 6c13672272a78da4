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

  test("minhash: verified pairs are symmetric-free (a<b) and meet the threshold") {
    val out = TextOps.dedupMinhash(spark, sf).cache()
    assert(out.filter(col("doc_id_a") >= col("doc_id_b")).count() === 0)
    assert(out.filter(col("jaccard") < 0.95).count() === 0)
    out.unpersist()
  }

  test("minhash finds identical-token-set pairs (jaccard = 1.0)") {
    // identical sets MUST share every band → always candidates → verified 1.0
    val ones = TextOps.dedupMinhash(spark, sf).filter(col("jaccard") === 1.0)
    assert(ones.count() > 0)
  }

  test("simhash: deterministic across runs and bounded to 32 bits") {
    val a = TextOps.dedupSimhash(spark, sf)
    val b = TextOps.dedupSimhash(spark, sf)
    assert(a.exceptAll(b).count() === 0)
    assert(a.filter(col("simhash") < 0 || col("simhash") >= (1L << 32)).count() === 0)
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
}

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

  test("embed dedup: pairs stay within a label bucket and meet the threshold") {
    val out = VectorOps.embedDedup(spark, sf)
    assert(out.filter(col("cos_sim") < 0.3).count() === 0)
    assert(out.filter(col("vec_id_a") >= col("vec_id_b")).count() === 0)
  }
}

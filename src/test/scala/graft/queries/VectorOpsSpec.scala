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
}

package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextOps

/** The mapPartitions batch-decode stub must agree byte-for-byte with the
  * SQL-expressible fake in TextOps.multimodalMeta — same schema, same
  * metadata — proving the plumbing (binary column, batch iteration, encoder)
  * carries the identical contract a real decoder would slot into.
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mapPartitions decode matches the SQL metadata extraction exactly") {
    val input = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
    val viaMapPartitions = MultimodalStub.decodeBatch(input)
    val viaSql = TextOps.multimodalMeta(spark, sf)
    assert(viaMapPartitions.schema.map(f => (f.name, f.dataType)) ===
      viaSql.schema.map(f => (f.name, f.dataType)))
    assert(viaMapPartitions.exceptAll(viaSql).count() === 0)
    assert(viaSql.exceptAll(viaMapPartitions).count() === 0)
  }

  test("decode output ranges: width/height/frames inside the stub's domains") {
    val out = MultimodalStub.decodeBatch(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")))
    assert(out.filter(!col("width").between(64, 256)).count() === 0)
    assert(out.filter(!col("height").between(64, 192)).count() === 0)
    assert(out.filter(!col("n_frames").between(1, 7)).count() === 0)
  }

  test("batch feature-extract matches the column twin exactly") {
    val input = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
    val batch = MultimodalStub.extractBatch(input)
    val sql = TextOps.mediaFeatures(spark, sf)
    assert(batch.schema.map(f => (f.name, f.dataType)) ===
      sql.schema.map(f => (f.name, f.dataType)))
    assert(batch.exceptAll(sql).count() === 0)
    assert(sql.exceptAll(batch).count() === 0)
    // the resize plan never upscales and respects the fit box
    assert(sql.filter(col("resized_w") > 64 || col("resized_h") > 64).count() === 0)
    assert(sql.filter(col("resized_w") > col("width") ||
      col("resized_h") > col("height")).count() === 0)
    // at least one dimension touches the box wall (aspect fit, w,h >= 64)
    assert(sql.filter(col("resized_w") < 63 && col("resized_h") < 63).count() === 0)
  }

  test("batch frame sampler matches the column twin; stride and key frames hold") {
    val input = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
    val batch = MultimodalStub.frameSampleBatch(input)
    val sql = TextOps.frameSample(spark, sf)
    assert(batch.schema.map(f => (f.name, f.dataType)) ===
      sql.schema.map(f => (f.name, f.dataType)))
    assert(batch.exceptAll(sql).count() === 0)
    assert(sql.exceptAll(batch).count() === 0)
    // every payload contributes frame 0 (its key frame), strides are even
    val metas = TextOps.multimodalMeta(spark, sf).count()
    assert(sql.filter(col("frame_idx") === 0).count() === metas)
    assert(sql.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(sql.filter(col("is_key_frame") =!= (col("frame_idx") === 0)).count() === 0)
  }
}

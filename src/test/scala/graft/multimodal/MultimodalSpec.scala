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

  test("mediaNeardup: pHash replica, copy clustering, Hamming pigeonhole") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    val original = (0 until 128).map(i => s"tok$i").mkString(" ")
    // one substituted token -> exactly cells 5 (positions 5 and 69 share
    // it; only position 5 changes) differ in the decoded grid
    val edited = (0 until 128)
      .map(i => if (i == 5) "edited" else s"tok$i").mkString(" ")
    val unrelated = (0 until 128).map(i => s"other$i").mkString(" ")
    Seq((1L, original), (2L, original), (3L, edited), (4L, unrelated))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.mediaNeardup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap

    // independent Scala replica of the WHOLE chain: md5 token hash ->
    // interleaved-mean grid -> quantized integer DCT -> AC sign bits
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    def phashOf(text: String): Long = {
      val hs = text.toLowerCase.trim.split("\\s+").map(h32(_) % 256)
      val g = Array.tabulate(64) { c =>
        val sel = hs.indices.filter(_ % 64 == c).map(hs)
        if (sel.isEmpty) 0L else sel.sum / sel.size
      }
      val ct = TextOps.PhCosTable
      val t = Array.tabulate(64)(k =>
        (0 until 8).map(i => ct(k / 8)(i) * g(i * 8 + k % 8)).sum)
      val d = Array.tabulate(64)(k =>
        (0 until 8).map(j => ct(k % 8)(j) * t(k / 8 * 8 + j)).sum)
      (1 until 64).map(k => if (d(k) > 0) 1L << (k - 1) else 0L).sum
    }
    assert(rows(1L)._1 === phashOf(original))
    assert(rows(3L)._1 === phashOf(edited))
    assert(rows(4L)._1 === phashOf(unrelated))

    // exact copies: identical phash, doc 2 clusters under rep 1
    assert(rows(1L)._1 === rows(2L)._1)
    assert(rows(1L) === ((rows(1L)._1, 1L, 0)))
    assert(rows(2L) === ((rows(1L)._1, 1L, 1)))
    // locality: the single-cell edit moves FAR fewer sign bits than a
    // full rewrite
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(rows(1L)._1, rows(3L)._1) < hamming(rows(1L)._1, rows(4L)._1))
    // pigeonhole invariant of the 7x9-bit banding: any pair within
    // Hamming PhBands-1 shares at least one intact band
    def bands(p: Long): Seq[Long] = (0 until TextOps.PhBands)
      .map(b => (p >> (b * TextOps.PhBandBits)) & ((1 << TextOps.PhBandBits) - 1))
    for (a <- rows.keys; b <- rows.keys if a < b) {
      val share = bands(rows(a)._1).zip(bands(rows(b)._1)).exists(p => p._1 == p._2)
      if (hamming(rows(a)._1, rows(b)._1) <= TextOps.PhBands - 1)
        assert(share, s"pigeonhole violated for ($a, $b)")
    }
    // cluster ids are bucket-min reps: never above the member's own id,
    // and self exactly when not a dup
    rows.foreach { case (id, (_, cl, dup)) =>
      assert(cl <= id && ((cl == id) == (dup == 0)))
    }
  }
}

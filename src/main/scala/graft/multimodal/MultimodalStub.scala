package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Batch "decode" plumbing for opaque multimodal payloads (image/audio/video
  * as `binary` columns with typed metadata).
  *
  * The container ships no media codecs, so the decode itself is a
  * DETERMINISTIC STUB: metadata (width/height/frame count) is derived from
  * the payload's sha256. Everything around it — the binary column handling,
  * output schema, per-partition batch iteration, and encoder wiring — is the
  * real production shape: a decoder library would replace [[decodeOne]]'s
  * body and nothing else. Matches the SQL-expressible fake in
  * `graft.queries.TextOps.multimodalMeta` byte for byte (asserted in
  * MultimodalSpec).
  */
object MultimodalStub {

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB: a real image/audio decoder replaces exactly this function. */
  private def decodeOne(docId: Long, payload: Array[Byte]): Row = {
    val sha = MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(sha.substring(0, 8), 16)
    val h2 = java.lang.Long.parseLong(sha.substring(8, 16), 16)
    Row(docId, payload.length.toLong, sha,
      (64 + h1 % 193).toInt, (64 + h2 % 129).toInt,
      (1 + payload.length % 7).toInt)
  }

  /** Per-partition batch decode over (doc_id LONG, bin BINARY) — the Scala
    * analog of a mapInPandas batch UDF: one iterator per partition, no
    * per-row task overhead, explicit output schema/encoder. Partitioning of
    * the input is preserved; at 100 TB the payload column never shuffles.
    */
  def decodeBatch(input: DataFrame): DataFrame =
    input.select("doc_id", "bin").mapPartitions { it =>
      it.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.row(outputSchema))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("resized_w", IntegerType, nullable = false),
    StructField("resized_h", IntegerType, nullable = false),
    // space-joined string, matching the column twin's array_join
    // serialization (the collectTypes discipline — raw arrays can't
    // survive a cross-engine row-sorted hash compare)
    StructField("embedding", StringType, nullable = false)))

  /** STUB feature extraction: a real vision/audio encoder replaces this
    * body (and would emit float embeddings instead of sha-slice ints);
    * the resize plan and batch wiring stay. Mirrors
    * `graft.queries.TextOps.mediaFeatures` value for value. */
  private def extractOne(docId: Long, payload: Array[Byte]): Row = {
    val sha = MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    val w = (64 + java.lang.Long.parseLong(sha.substring(0, 8), 16) % 193).toInt
    val h = (64 + java.lang.Long.parseLong(sha.substring(8, 16), 16) % 129).toInt
    val box = graft.queries.TextOps.MediaFitBox.toDouble
    val scale = math.min(box / w, box / h)
    val emb = (0 until 8).map { i =>
      java.lang.Long.parseLong(sha.substring(8 * i, 8 * i + 8), 16) % 256 - 128
    }
    Row(docId, w, h, math.floor(w * scale).toInt, math.floor(h * scale).toInt,
      emb.mkString(" "))
  }

  /** Batch feature-extract over (doc_id, bin) — same mapPartitions shape
    * as [[decodeBatch]]. */
  def extractBatch(input: DataFrame): DataFrame =
    input.select("doc_id", "bin").mapPartitions { it =>
      it.map(r => extractOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.row(featureSchema))

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_sha", StringType, nullable = false),
    StructField("is_key_frame", BooleanType, nullable = false)))

  /** STUB frame sampling: a real codec's seek-and-decode replaces the
    * per-frame digest; the stride iteration, flatMap batch shape, and
    * schema stay. Mirrors `graft.queries.TextOps.frameSample`. */
  private def frameSampleOne(docId: Long, payload: Array[Byte]): Iterator[Row] = {
    val sha = MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    val nFrames = (1 + payload.length % 7).toInt
    (0 until nFrames by graft.queries.TextOps.FrameStride).iterator.map { f =>
      val frameSha = MessageDigest.getInstance("SHA-256")
        .digest(s"$sha:$f".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Row(docId, f.toLong, frameSha, f == 0)
    }
  }

  /** Batch frame sampler over (doc_id, bin) — flatMap per partition: one
    * input payload, 0..n output frames, payload bytes never carried past
    * the digest. */
  def frameSampleBatch(input: DataFrame): DataFrame =
    input.select("doc_id", "bin").mapPartitions { it =>
      it.flatMap(r => frameSampleOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.row(frameSchema))
}

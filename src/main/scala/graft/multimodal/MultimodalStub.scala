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
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual media codecs are NOT available in this container, so the
  * decode kernels are STUBBED with a clearly-marked deterministic fake
  * (`fakeDecode*`). Everything Spark-side is real and tested: the schema,
  * the typed Dataset batch shape, partition-preserving `mapPartitions`
  * (the Scala analog of `mapInPandas` — one iterator per partition, batch
  * amortization), and the feature-vector output layout an embedding stage
  * would consume.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      frames: Int, features: Array[Float])

  /** Synthesize a media table from the documents table: payload bytes are a
    * deterministic function of (doc_id, text) — stand-ins for real
    * image/audio bytes. */
  def synthMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio").otherwise("video").as("kind"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).as("sample_rate"))

  /** STUB decode kernel: a real implementation would call an image/audio
    * codec here (libjpeg/ffmpeg via JNI, or `mapInPandas`+PIL on PySpark).
    * The fake is deterministic in the payload bytes so tests are stable. */
  private def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Frame sampling for "video": every `stride`-th 256-byte block is a
    * "frame" (stand-in for ffmpeg keyframe extraction). */
  private def fakeFrameCount(payload: Array[Byte], stride: Int): Int =
    math.max(1, payload.length / (256 * stride))

  /** Partition-batched feature extraction: the Spark-side shape is real —
    * one iterator per partition, constant per-partition setup cost (where a
    * codec context would be initialized once), typed output. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16,
      frameStride: Int = 2): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens HERE once (codec contexts, model handles)
      rows.map { r =>
        val feats = fakeDecodeFeatures(r.payload, dim)
        val frames = if (r.kind == "video") fakeFrameCount(r.payload, frameStride) else 1
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, frames, feats)
      }
    }
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads as opaque `binary` columns
 * with typed metadata, plus batched feature extraction.
 *
 * The image/audio decode libraries are NOT present in this environment, so
 * the decoder body is a clearly-marked deterministic STUB (a byte
 * histogram standing in for "decode then embed"); everything around it —
 * schema, null-safety, per-partition batching via `mapPartitions` on a
 * typed Dataset, the frame-sampling slice algebra — is the real Spark
 * plumbing a production decode would use unchanged. At scale the decode
 * is embarrassingly parallel: no shuffle, one pass, codegen'd slicing.
 */
object Multimodal {

  case class MediaRow(media_id: Long, mime: String, nbytes: Long, blob: Array[Byte])
  case class MediaFeature(media_id: Long, dim: Int, feature: Array[Float])

  /**
   * Testdata has no binary payloads; manufacture blobs from document text
   * (UTF-8 bytes) with media metadata — the plumbing under test is the
   * binary-column handling, not the payload's origin.
   */
  def documentBlobs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("blob"))
      .withColumn("nbytes", octet_length(col("blob")).cast("long"))

  /**
   * STUB DECODER: a real pipeline would decode the image/audio here
   * (libs unavailable in this container). The deterministic stand-in is a
   * normalized 16-bucket byte histogram — shaped exactly like an embedding
   * head (fixed dim, Array[Float], null-safe), so swapping in a real
   * decoder changes only this function's body.
   */
  def stubDecodeFeature(blob: Array[Byte], dim: Int = 16): Array[Float] = {
    val counts = new Array[Float](dim)
    if (blob == null || blob.isEmpty) return counts
    var i = 0
    while (i < blob.length) {
      counts((blob(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = blob.length.toFloat
    var j = 0
    while (j < dim) { counts(j) /= n; j += 1 }
    counts
  }

  /** Batched per-partition feature extraction (typed, no shuffle). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("nbytes"), col("blob"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // One batch per partition: a real decoder would init its native
        // context here once, then stream rows through it.
        rows.map(r => MediaFeature(r.media_id, dim, stubDecodeFeature(r.blob, dim)))
      }
  }

  /**
   * Frame sampling: fixed-width byte windows every `stride` bytes
   * (the video-frame access pattern), pure slice algebra on the binary
   * column — one row per (media, frame).
   */
  def sampleFrames(media: DataFrame, width: Int, stride: Int): DataFrame = {
    val nFrames = greatest(
      lit(0),
      ((col("nbytes") - width) / stride).cast("long") + 1)
    media
      .where(col("nbytes") >= width) // before explode: keeps sequence() ascending
      .select(col("media_id"), col("nbytes"), col("blob"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_no"))
      .select(
        col("media_id"), col("frame_no"),
        substring(col("blob"), (col("frame_no") * stride + 1).cast("int"), lit(width))
          .as("frame"))
  }
}

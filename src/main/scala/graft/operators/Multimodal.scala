package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (engine scope, SURVEY.md §7.1 Tier B):
  * image/audio/video payloads travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract runs per-partition in
  * batch form.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * codecs): `stubDecodeFeatures` derives a deterministic fake feature
  * vector from the bytes. Everything around it — schema, the
  * binary+metadata column convention, the per-partition batch iteration,
  * partition sizing — is the real plumbing a codec-backed implementation
  * would drop into.
  *
  * Scale notes: blobs never pass through a shuffle wider than their
  * partition (feature extraction is mapPartitions — narrow); metadata-only
  * queries prune the blob column at the parquet scan.
  */
object Multimodal {

  /** Typed result row of the feature-extraction stage. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, content_md5: String,
                           features: Array[Float])

  /** Wrap a source with a text-ish payload column into the multimodal
    * convention: (media_id, blob binary, meta struct<n_bytes, kind>). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("blob"),
      struct(
        length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit(kind).as("kind")).as("meta"))

  /** STUB decode: a real implementation would decode the codec here
    * (JPEG/PNG/WAV/...) and emit pooled features. This fake derives
    * `dim` floats deterministically from byte sums over `dim` stripes —
    * stable across runs and partitionings, so it is testable. */
  private def stubDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(1, bytes.length / dim)
      var d = 0
      while (d < dim) { out(d) /= n.toFloat; d += 1 }
    }
    out
  }

  /** Per-partition batch feature extraction over a media table produced
    * by [[asMediaTable]]. mapPartitions (not a per-row UDF) so a real
    * decoder could amortize codec/model setup per batch — the Scala
    * analog of `mapInPandas` batch shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup would happen here (codec init, model load)
        rows.map { case (id, bytes) =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length, md5, stubDecodeFeatures(bytes, dim))
        }
      }
  }

  /** One resized image row: the blob after the (stubbed) resize plus its
    * new pixel dimensions. */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          blob: Array[Byte])

  /** STUB resize: a real implementation decodes, scales with an image
    * library, re-encodes. The fake deterministically downsamples the
    * byte stream to `width*height` bytes (stride sampling) so output
    * size, schema, and per-partition batching behave like the real op. */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    val target = width * height
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val out = new Array[Byte](math.min(target, math.max(bytes.length, 1)))
          if (bytes.nonEmpty) {
            val stride = math.max(1, bytes.length / out.length)
            var i = 0
            while (i < out.length) {
              out(i) = bytes(math.min(i.toLong * stride, bytes.length - 1).toInt)
              i += 1
            }
          }
          ResizedMedia(id, width, height, out)
        }
      }
  }

  /** One sampled frame: parent media, frame index, and the frame blob. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling: a real implementation seeks keyframes in the
    * container. The fake slices the byte stream into `everyNth`-spaced
    * fixed-size windows. Emits 0..k rows per input row (flatMap shape —
    * exactly how a real sampler fans out), so downstream ops see the
    * (media_id, frame_idx) long-form layout. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 256, everyNth: Int = 4)
      : Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(bytes.length / frameBytes, 0)
        (0 until nFrames by everyNth).map { f =>
          MediaFrame(id, f,
            java.util.Arrays.copyOfRange(bytes, f * frameBytes,
              math.min((f + 1) * frameBytes, bytes.length)))
        }
      }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (engine scope, SURVEY.md §7.1 Tier B):
  * image/audio/video payloads travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract runs per-partition in
  * batch form.
  *
  * IMAGE decode is REAL: `kind = "image"` blobs go through
  * `javax.imageio` (PNG/JPEG/BMP/GIF ship with the JDK) and the feature
  * vector is grid-pooled mean luminance over the decoded pixels.
  * AUDIO decode is REAL for JDK-supported containers (`kind = "audio"`,
  * WAV/AIFF/AU PCM via `javax.sound.sampled`): features are per-window
  * RMS energy over the mono-mixed signal. IMAGE RESIZE is REAL
  * (`ImageIO` decode → `Graphics2D` bilinear scale → PNG re-encode).
  * VIDEO frame sampling is REAL for MJPEG (concatenated-JPEG — the one
  * container whose frames the JDK can decode): [[sampleFrames]] cuts on
  * the JPEG SOI/EOI markers and each emitted frame is a standalone
  * ImageIO-decodable image. General video codecs (H.264 etc.) stay
  * STUBBED — no such codec ships with the JDK: `stubDecodeFeatures`
  * derives a deterministic fake vector from the bytes, and undecodable
  * image/audio/video blobs fall back to stub paths too (the
  * `decoder`/`codec` output fields say which path ran). Everything
  * around the decode — schema, the binary+metadata column convention,
  * the per-partition batch iteration, partition sizing — is shared.
  *
  * Scale notes: blobs never pass through a shuffle wider than their
  * partition (feature extraction is mapPartitions — narrow); metadata-only
  * queries prune the blob column at the parquet scan.
  */
object Multimodal {

  /** Typed result row of the feature-extraction stage; `decoder` is
    * "imageio" when the blob was really decoded, "stub" otherwise. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, content_md5: String,
                           features: Array[Float], decoder: String)

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

  /** Real image decode: grid-pooled mean luminance (BT.601 weights) of
    * the decoded pixels, pooled into a ceil(sqrt(dim))-wide cell grid —
    * deterministic, partition-independent, and sensitive to actual
    * image content (unlike the byte stub). None when `javax.imageio`
    * has no reader for the bytes. */
  private[operators] def decodeImageFeatures(bytes: Array[Byte],
                                             dim: Int): Option[Array[Float]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
      val gh = math.ceil(dim.toDouble / gw).toInt
      val out = new Array[Float](dim)
      val counts = new Array[Int](dim)
      var y = 0
      while (y < img.getHeight) {
        val gy = math.min(gh - 1, y * gh / img.getHeight)
        var x = 0
        while (x < img.getWidth) {
          val gx = math.min(gw - 1, x * gw / img.getWidth)
          val cell = gy * gw + gx
          if (cell < dim) {
            val rgb = img.getRGB(x, y)
            out(cell) += (((rgb >> 16) & 0xff) * 0.299f +
              ((rgb >> 8) & 0xff) * 0.587f + (rgb & 0xff) * 0.114f) / 255.0f
            counts(cell) += 1
          }
          x += 1
        }
        y += 1
      }
      var d = 0
      while (d < dim) { if (counts(d) > 0) out(d) /= counts(d); d += 1 }
      Some(out)
    }
  }

  /** Real audio decode (the r5 image upgrade, mirrored for sound):
    * JDK-native `javax.sound.sampled` parses WAV/AIFF/AU containers;
    * the stream is converted to 16-bit signed PCM when it isn't
    * already, channels are mixed to mono, and the feature vector is
    * per-window RMS energy over `dim` equal time slices, normalized to
    * [0, 1] — deterministic, partition-independent, and sensitive to
    * actual signal content. None when the bytes aren't a parseable
    * audio container (the caller falls back to the stub). */
  private[operators] def decodeAudioFeatures(bytes: Array[Byte],
                                             dim: Int): Option[Array[Float]] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val src = raw.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
        src.getSampleRate, false)
      val in =
        if (src.matches(target)) raw
        else AudioSystem.getAudioInputStream(target, raw)
      val data =
        try in.readAllBytes()
        finally { in.close(); raw.close() }
      val channels = target.getChannels
      val nFrames = data.length / (2 * channels)
      if (nFrames <= 0) None
      else {
        // mono mix, then RMS per contiguous time window
        val sumSq = new Array[Double](dim)
        val counts = new Array[Int](dim)
        var f = 0
        while (f < nFrames) {
          var mix = 0.0
          var c = 0
          while (c < channels) {
            val o = (f * channels + c) * 2
            // little-endian signed 16-bit
            mix += ((data(o) & 0xff) | (data(o + 1) << 8)).toShort.toDouble
            c += 1
          }
          mix /= channels
          val w = math.min(dim - 1, (f.toLong * dim / nFrames).toInt)
          sumSq(w) += mix * mix
          counts(w) += 1
          f += 1
        }
        val out = new Array[Float](dim)
        var d = 0
        while (d < dim) {
          if (counts(d) > 0)
            out(d) = (math.sqrt(sumSq(d) / counts(d)) / 32768.0).toFloat
          d += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** Per-partition batch feature extraction over a media table produced
    * by [[asMediaTable]]. mapPartitions (not a per-row UDF) so the
    * decoder amortizes codec setup per batch — the Scala analog of
    * `mapInPandas` batch shape. `kind = "image"` and `kind = "audio"`
    * rows are REALLY decoded ([[decodeImageFeatures]] /
    * [[decodeAudioFeatures]]); other kinds, and blobs the JDK codecs
    * cannot parse, take the deterministic stub. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition codec setup: no ImageIO disk cache on executors
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes, kind) =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          val (features, decoder) =
            if (kind == "image")
              decodeImageFeatures(bytes, dim) match {
                case Some(f) => (f, "imageio")
                case None => (stubDecodeFeatures(bytes, dim), "stub")
              }
            else if (kind == "audio")
              decodeAudioFeatures(bytes, dim) match {
                case Some(f) => (f, "sound")
                case None => (stubDecodeFeatures(bytes, dim), "stub")
              }
            else (stubDecodeFeatures(bytes, dim), "stub")
          MediaFeatures(id, bytes.length, md5, features, decoder)
        }
      }
  }

  /** One resized image row: the re-encoded blob plus its new pixel
    * dimensions; `codec` is "imageio" when the blob was really decoded,
    * scaled, and re-encoded, "stub" for undecodable bytes. */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          blob: Array[Byte], codec: String)

  /** Real single-image resize: decode via `javax.imageio`, scale with
    * `Graphics2D.drawImage` under a bilinear interpolation hint, and
    * re-encode as PNG. None when the bytes aren't a decodable image. */
  private[operators] def resizeImage(bytes: Array[Byte], width: Int,
                                     height: Int): Option[Array[Byte]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      import java.awt.RenderingHints
      val scaled = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.setRenderingHint(RenderingHints.KEY_RENDERING,
          RenderingHints.VALUE_RENDER_QUALITY)
        g.drawImage(img, 0, 0, width, height, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      if (javax.imageio.ImageIO.write(scaled, "png", baos))
        Some(baos.toByteArray)
      else None
    }
  }

  /** Image resize over a media table: REAL decode → bilinear scale →
    * PNG re-encode per blob ([[resizeImage]]) inside the same
    * mapPartitions batch shape as [[extractFeatures]] (codec setup
    * amortized per partition; blobs never shuffle). Undecodable blobs
    * fall back to a deterministic byte-stride downsample to
    * `width*height` bytes — `codec` says which path ran. */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    val target = width * height
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          resizeImage(bytes, width, height) match {
            case Some(png) => ResizedMedia(id, width, height, png, "imageio")
            case None =>
              val out =
                new Array[Byte](math.min(target, math.max(bytes.length, 1)))
              if (bytes.nonEmpty) {
                val stride = math.max(1, bytes.length / out.length)
                var i = 0
                while (i < out.length) {
                  out(i) =
                    bytes(math.min(i.toLong * stride, bytes.length - 1).toInt)
                  i += 1
                }
              }
              ResizedMedia(id, width, height, out, "stub")
          }
        }
      }
  }

  /** One sampled frame: parent media, frame index, the frame blob, and
    * which path produced it (`"mjpeg"` = a real standalone JPEG cut
    * from the container; `"stub"` = byte-window slice). */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte],
                        decoder: String)

  /** Frame boundaries of an MJPEG (concatenated-JPEG) byte stream:
    * `(start, end)` offsets of each complete SOI..EOI image, in order.
    * MJPEG is the one video container the JDK can genuinely decode —
    * every frame is an independent baseline JPEG, so cutting on the
    * `FFD8 FF` start-of-image and `FFD9` end-of-image markers yields
    * blobs `javax.imageio` reads directly. (Entropy-coded data cannot
    * contain a bare `FFD9`: JPEG byte-stuffs `FF` as `FF00`, and
    * restart markers stop at `FFD7`. Frames carrying EXIF thumbnails
    * with their own EOI would split early — MJPEG frames are JFIF
    * baseline without thumbnails, so out of scope and documented.) */
  /** The EXTERNAL-BINARY boundary for general video codecs (H.264 &
    * co.) — the one decode path no JDK codec can serve. The contract is
    * codec-agnostic and ffmpeg-shaped: the tool at `toolPath` is
    * invoked per blob as `<tool> <inputFile> <outputDir>`, must exit 0,
    * and must write one file per extracted frame into `outputDir`
    * (lexicographic name order = frame order) — an ffmpeg deployment
    * wraps `ffmpeg -i $1 $2/frame_%05d.jpg` in a two-line script. Every
    * `everyNth`-th frame is emitted as a [[MediaFrame]] with
    * `decoder = "external"`; null blobs emit no rows.
    *
    * A non-zero exit FAILS the task loudly with the tool's combined
    * output — a silently-skipped decode would corrupt the corpus (the
    * `maxGroupRows` loud-failure philosophy applied to codecs). Scale
    * shape: mapPartitions (the documented media-batch last resort);
    * one temp dir per blob, cleaned per blob; blobs never shuffle
    * wider than their partition; process startup amortizes over frame
    * count, and a deployment that needs finer control points
    * `toolPath` at a batching wrapper. This container ships no real
    * codec, so the boundary is exercised by a deterministic fake
    * cutter in the spec and the execution gate — the Spark-side
    * plumbing (temp-file handoff, exit-code contract, frame ordering,
    * fan-out shape, cleanup) is what the gate pins. */
  def sampleFramesExternal(spark: SparkSession, media: DataFrame,
                           toolPath: String, everyNth: Int = 1)
      : Dataset[MediaFrame] = {
    import spark.implicits._
    require(everyNth >= 1, s"everyNth must be >= 1: $everyNth")
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Seq.empty[MediaFrame]
        else {
          val tmp = java.nio.file.Files.createTempDirectory("graft_vid")
          try {
            val in = tmp.resolve("input.bin")
            java.nio.file.Files.write(in, bytes)
            val outDir = tmp.resolve("frames")
            java.nio.file.Files.createDirectory(outDir)
            val p = new ProcessBuilder(toolPath, in.toString,
              outDir.toString).redirectErrorStream(true).start()
            val log = new String(p.getInputStream.readAllBytes, "UTF-8")
            val rc = p.waitFor()
            if (rc != 0)
              throw new IllegalStateException(
                s"external decoder '$toolPath' exited $rc for media " +
                  s"$id: ${log.take(500)}")
            val frames = Option(outDir.toFile.listFiles)
              .getOrElse(Array.empty).sortBy(_.getName)
            frames.indices.by(everyNth).map { f =>
              MediaFrame(id, f,
                java.nio.file.Files.readAllBytes(frames(f).toPath),
                "external")
            }.toSeq
          } finally {
            def purge(x: java.io.File): Unit = {
              Option(x.listFiles).foreach(_.foreach(purge)); x.delete(); ()
            }
            purge(tmp.toFile)
          }
        }
      }
  }

  private[graft] def splitMjpegFrames(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val n = bytes.length
    var i = 0
    while (i + 3 < n) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8 &&
          (bytes(i + 2) & 0xff) == 0xff) {
        var j = i + 2
        var end = -1
        while (j + 1 < n && end < 0) {
          if ((bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xd9)
            end = j + 2
          j += 1
        }
        if (end > 0) { out += ((i, end)); i = end } else i = n
      } else i += 1
    }
    out.toSeq
  }

  /** Frame sampling over a media table. REAL for MJPEG payloads: the
    * container is cut into its standalone JPEG frames
    * ([[splitMjpegFrames]]) and every `everyNth`-th frame is emitted
    * whole (`frame_idx` = true frame index, `frameBytes` does not
    * apply, `decoder = "mjpeg"` — each emitted blob is ImageIO-decodable
    * and feeds [[extractFeatures]] / [[resize]] as `kind = "image"`).
    * Non-MJPEG payloads (no SOI marker found) take the deterministic
    * byte-window stub: `everyNth`-spaced `frameBytes`-sized slices,
    * `decoder = "stub"`. Emits 0..k rows per input row (flatMap shape —
    * exactly how a real sampler fans out), so downstream ops see the
    * (media_id, frame_idx) long-form layout either way. Per-partition
    * batch shape as the other extractors; blobs never shuffle wider
    * than their partition. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 256, everyNth: Int = 4)
      : Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("media_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val jpegs = splitMjpegFrames(bytes)
        if (jpegs.nonEmpty)
          jpegs.indices.by(everyNth).map { f =>
            val (s, e) = jpegs(f)
            MediaFrame(id, f,
              java.util.Arrays.copyOfRange(bytes, s, e), "mjpeg")
          }
        else {
          val nFrames = math.max(bytes.length / frameBytes, 0)
          (0 until nFrames by everyNth).map { f =>
            MediaFrame(id, f,
              java.util.Arrays.copyOfRange(bytes, f * frameBytes,
                math.min((f + 1) * frameBytes, bytes.length)), "stub")
          }
        }
      }
  }
}

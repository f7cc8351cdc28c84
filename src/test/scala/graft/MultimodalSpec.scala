package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Tables.documents(spark, sfDir), "doc_id", "text", "text")

  test("asMediaTable: blob + typed metadata struct schema") {
    val schema = media.schema
    assert(schema("blob").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val m = media.selectExpr("meta.n_bytes", "meta.kind", "length(blob)")
      .as[(Int, String, Int)].collect()
    assert(m.forall { case (n, kind, len) => n == len && kind == "text" })
  }

  test("extractFeatures: deterministic across partitionings") {
    val a = Multimodal.extractFeatures(spark, media.repartition(1))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, media.repartition(7))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 16))
  }

  private def pngBytes(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("extractFeatures really decodes image blobs via javax.imageio") {
    // 8x8 PNG: left half black, right half white -> with dim=4 the 2x2
    // luminance grid must read [left~0, right~1, left~0, right~1]
    val png = pngBytes(8, 8, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val imgDf = Seq((1L, png)).toDF("id", "payload")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(imgDf, "id", "payload", "image"), dim = 4)
      .collect().head
    assert(feats.decoder == "imageio")
    assert(feats.n_bytes == png.length)
    val f = feats.features
    assert(f.length == 4)
    assert(math.abs(f(0)) < 1e-3 && math.abs(f(2)) < 1e-3, f.toSeq)   // black
    assert(math.abs(f(1) - 1.0) < 1e-3 && math.abs(f(3) - 1.0) < 1e-3, f.toSeq)
    // decode is content-sensitive, not byte-stripe: inverted image flips it
    val inv = pngBytes(8, 8, (x, _) => if (x < 4) 0xFFFFFF else 0x000000)
    val f2 = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(Seq((1L, inv)).toDF("id", "payload"),
        "id", "payload", "image"), dim = 4).collect().head.features
    assert(math.abs(f2(0) - 1.0) < 1e-3 && math.abs(f2(1)) < 1e-3)
  }

  private def wavBytes(samples: Array[Short], sampleRate: Float = 8000f,
                       channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, channels, 2 * channels, sampleRate, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      fmt, samples.length / channels)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("extractFeatures really decodes WAV audio via javax.sound.sampled") {
    // 8000 samples: first half silence, second half a full-scale square
    // wave -> with dim=4 the RMS windows must read [0, 0, ~1, ~1]
    val samples = Array.tabulate[Short](8000) { i =>
      if (i < 4000) 0
      else if ((i / 20) % 2 == 0) 32767 else -32768
    }
    val wav = wavBytes(samples)
    val df = Seq((1L, wav)).toDF("id", "payload")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(df, "id", "payload", "audio"), dim = 4)
      .collect().head
    assert(feats.decoder == "sound")
    assert(feats.n_bytes == wav.length)
    val f = feats.features
    assert(f.length == 4)
    assert(math.abs(f(0)) < 1e-4 && math.abs(f(1)) < 1e-4, f.toSeq)
    assert(f(2) > 0.95f && f(3) > 0.95f, f.toSeq)
    // content-sensitive, not byte-stripe: swapping halves flips windows
    val swapped = wavBytes(samples.reverse)
    val f2 = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(Seq((1L, swapped)).toDF("id", "payload"),
        "id", "payload", "audio"), dim = 4).collect().head.features
    assert(f2(0) > 0.95f && math.abs(f2(3)) < 1e-4, f2.toSeq)
    // stereo mixes to mono: L = full-scale square, R = its negation
    // cancel to silence everywhere
    val stereo = Array.tabulate[Short](8000) { i =>
      // +-32000 so the negation can't overflow Short.MinValue
      val v: Short = if ((i / 40) % 2 == 0) 32000 else -32000
      if (i % 2 == 0) v else (-v).toShort
    }
    val f3 = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(Seq((1L, wavBytes(stereo, channels = 2)))
        .toDF("id", "payload"), "id", "payload", "audio"), dim = 4)
      .collect().head
    assert(f3.decoder == "sound")
    assert(f3.features.forall(v => math.abs(v) < 1e-3), f3.features.toSeq)
  }

  test("audio kind falls back to the stub for non-audio bytes") {
    val junk = Seq((9L, "definitely not a wav".getBytes("UTF-8")))
      .toDF("id", "payload")
    val r = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(junk, "id", "payload", "audio")).collect().head
    assert(r.decoder == "stub")
  }

  test("extractFeatures falls back to the stub for undecodable blobs") {
    // kind=image but not an image -> stub path, flagged as such
    val junk = Seq((7L, "not actually an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val r = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(junk, "id", "payload", "image")).collect().head
    assert(r.decoder == "stub")
    // non-image kinds never attempt a decode
    val txt = Multimodal.extractFeatures(spark, media).collect()
    assert(txt.forall(_.decoder == "stub"))
  }

  test("resize really rescales images: decoded dims + content preserved") {
    // 16x16 PNG, left half black / right half white, resized to 8x6:
    // output must decode as a real 8x6 PNG with the same halves
    val png = pngBytes(16, 16, (x, _) => if (x < 8) 0x000000 else 0xFFFFFF)
    val imgMedia = Multimodal.asMediaTable(
      Seq((1L, png)).toDF("id", "payload"), "id", "payload", "image")
    val r = Multimodal.resize(spark, imgMedia, 8, 6).collect().head
    assert(r.codec == "imageio")
    assert((r.width, r.height) == ((8, 6)))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.blob))
    assert((back.getWidth, back.getHeight) == ((8, 6)))
    def lum(rgb: Int): Double =
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3 * 255.0)
    // sample away from the seam so bilinear blending doesn't bleed
    assert(lum(back.getRGB(0, 3)) < 0.1 && lum(back.getRGB(1, 0)) < 0.1)
    assert(lum(back.getRGB(7, 3)) > 0.9 && lum(back.getRGB(6, 5)) > 0.9)
    // upscale works too (bilinear interpolation, not byte tricks)
    val up = Multimodal.resize(spark, imgMedia, 32, 32).collect().head
    val backUp = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(up.blob))
    assert(up.codec == "imageio" &&
      (backUp.getWidth, backUp.getHeight) == ((32, 32)))
  }

  test("resize: undecodable blobs take the stub path, bounded output") {
    val out = Multimodal.resize(spark, media, 8, 8).collect()
    assert(out.forall(_.codec == "stub")) // text blobs aren't images
    assert(out.forall(r => r.blob.length <= 64 && r.blob.nonEmpty))
    assert(out.forall(r => r.width == 8 && r.height == 8))
  }

  test("sampleFrames: long-form fan-out with strided indices") {
    val frames = Multimodal.sampleFrames(spark, media,
      frameBytes = 64, everyNth = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.decoder == "stub")) // text blobs aren't MJPEG
    assert(frames.forall(_.frame.length <= 64))
    assert(frames.forall(_.frame_idx % 2 == 0))
    // frame count per doc matches the stride arithmetic
    val perDoc = frames.groupBy(_.media_id).view.mapValues(_.length)
    val expected = media.selectExpr("media_id", "length(blob)")
      .as[(Long, Int)].collect().toMap
      .view.mapValues(len => (0 until len / 64 by 2).size)
    perDoc.foreach { case (id, n) => assert(n == expected(id)) }
  }

  private def jpegBytes(gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    baos.toByteArray
  }

  test("sampleFrames: real MJPEG cut on SOI/EOI, frames decode") {
    // MJPEG = concatenated JPEGs; 6 frames of increasing brightness
    val grays = Seq(0, 50, 100, 150, 200, 250)
    val mjpeg = grays.flatMap(jpegBytes).toArray
    val vid = Multimodal.asMediaTable(
      Seq((7L, mjpeg)).toDF("id", "payload"), "id", "payload", "video")
    val frames = Multimodal.sampleFrames(spark, vid, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.decoder == "mjpeg"))
    // every sampled frame is a standalone decodable JPEG whose mean
    // luminance tracks the planted brightness ramp
    val lums = frames.map { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
      (for (y <- 0 until 8; x <- 0 until 8)
        yield (img.getRGB(x, y) & 0xff).toDouble).sum / 64.0
    }
    assert(lums(0) < lums(1) && lums(1) < lums(2), lums.toSeq.toString)
    // boundary discipline: frame count and offsets cover all 6 JPEGs
    assert(Multimodal.splitMjpegFrames(mjpeg).size == 6)
    // and the sampled-frame output feeds the image pipeline for real
    val refeed = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(
        frames.map(f => (f.frame_idx.toLong, f.frame)).toSeq
          .toDF("id", "payload"), "id", "payload", "image"), dim = 4)
      .collect()
    assert(refeed.forall(_.decoder == "imageio"))
  }

  private def writeTool(body: String): String = {
    val p = java.nio.file.Files.createTempFile("graft_tool", ".sh")
    java.nio.file.Files.write(p, ("#!/bin/sh\n" + body).getBytes("UTF-8"))
    p.toFile.setExecutable(true)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("sampleFramesExternal: tool contract — frame files in name " +
    "order, exact bytes round-trip, everyNth sampling, null blobs " +
    "emit nothing") {
    // fake decoder: three frames — first 2 bytes, next 2, the rest
    val tool = writeTool(
      """head -c 2 "$1" > "$2/f_0"
        |tail -c +3 "$1" | head -c 2 > "$2/f_1"
        |tail -c +5 "$1" > "$2/f_2"
        |""".stripMargin)
    val media = Multimodal.asMediaTable(
      Seq((1L, Option("abcdefgh")), (2L, Option("xy")),
        (3L, Option.empty[String]))
        .toDF("id", "payload"), "id", "payload", "video")
    val out = Multimodal.sampleFramesExternal(spark, media, tool)
      .collect().map(f =>
        (f.media_id, f.frame_idx) -> new String(f.frame, "UTF-8")).toMap
    assert(out == Map(
      (1L, 0) -> "ab", (1L, 1) -> "cd", (1L, 2) -> "efgh",
      (2L, 0) -> "xy", (2L, 1) -> "", (2L, 2) -> ""),
      out.toString) // null blob (id 3) emits no rows
    assert(out.keySet.forall(_._1 != 3L))
    val every2 = Multimodal.sampleFramesExternal(spark, media, tool,
      everyNth = 2).collect().filter(_.media_id == 1L)
      .map(_.frame_idx).sorted.toSeq
    assert(every2 == Seq(0, 2))
  }

  test("sampleFramesExternal: a non-zero tool exit fails the job " +
    "LOUDLY with the tool's output, never skips silently") {
    val tool = writeTool("echo 'codec exploded' >&2; exit 3\n")
    val media = Multimodal.asMediaTable(
      Seq((1L, "abc")).toDF("id", "payload"), "id", "payload", "video")
    interceptGuard("exited 3", "codec exploded") {
      Multimodal.sampleFramesExternal(spark, media, tool).collect()
    }
  }
}

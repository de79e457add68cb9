package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  test("synthetic image encode/decode roundtrip") {
    val img = decodeImage(syntheticImageBytes(seed = 5, w = 4, h = 3))
    assert(img.width === 4 && img.height === 3 && img.pixels.length === 12)
    // pixel(i) = (5*7 + 13i) % 256
    assert((img.pixels(0) & 0xFF) === 35)
    assert((img.pixels(1) & 0xFF) === 48)
    intercept[IllegalArgumentException] { decodeImage(Array[Byte](1, 2, 3, 4)) }
  }

  test("nearest-neighbor resize picks correct source pixels") {
    // 2x2 image: [10 20 / 30 40] upscaled to 4x4 repeats each pixel 2x2
    val img = Image(2, 2, Array(10, 20, 30, 40).map(_.toByte))
    val up = resizeNearest(img, 4, 4)
    assert(up.pixels.map(_ & 0xFF).toSeq ===
      Seq(10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40))
    val down = resizeNearest(up, 1, 1)
    assert((down.pixels(0) & 0xFF) === 10)
  }

  test("features = [mean, min, max] over unsigned pixels") {
    val img = Image(2, 2, Array(0, 100, 200, 255).map(_.toByte).map(_.toByte))
    val f = imageFeatures(img)
    assert(f.toSeq === Seq(138.75f, 0f, 255f))
  }

  test("video decode + frame sampling") {
    val vid = decodeVideo(syntheticVideoBytes(seed = 1, w = 2, h = 2, frames = 7))
    assert(vid.size === 7)
    assert(sampleFrames(vid, 3).size === 3) // frames 0, 3, 6
    assert(sampleFrames(vid, 3).head.pixels.toSeq === vid.head.pixels.toSeq)
    intercept[IllegalArgumentException] { sampleFrames(vid, 0) }
  }

  test("real PNG/BMP/JPEG bytes decode through ImageIO with BT.601 luma") {
    import java.awt.image.BufferedImage
    def pngBytes(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // RGB PNG (lossless): known colors → exact integer luma
    val rgb = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xFF0000) // red   → (299*255+500)/1000 = 76
    rgb.setRGB(1, 0, 0x00FF00) // green → (587*255+500)/1000 = 150
    rgb.setRGB(0, 1, 0x0000FF) // blue  → (114*255+500)/1000 = 29
    rgb.setRGB(1, 1, 0xFFFFFF) // white → 255
    val img = decodeImage(pngBytes(rgb, "png"))
    assert(img.width === 2 && img.height === 2)
    assert(img.pixels.map(_ & 0xFF).toSeq === Seq(76, 150, 29, 255))

    // grayscale PNG: luma of r=g=b is the identity → pixels round-trip
    val gray = new BufferedImage(3, 2, BufferedImage.TYPE_BYTE_GRAY)
    val vals = Seq(0, 51, 102, 153, 204, 255)
    vals.zipWithIndex.foreach { case (v, i) =>
      gray.getRaster.setSample(i % 3, i / 3, 0, v)
    }
    assert(decodeImage(pngBytes(gray, "png")).pixels.map(_ & 0xFF).toSeq === vals)

    // BMP decodes exactly too; JPEG is lossy — dims + rough values only
    assert(decodeImage(pngBytes(rgb, "bmp")).pixels.map(_ & 0xFF).toSeq
      === Seq(76, 150, 29, 255))
    val jpg = decodeImage(pngBytes(gray, "jpg"))
    assert(jpg.width === 3 && jpg.height === 2)

    // the downstream transforms run on ImageIO-decoded pixels unchanged
    val f = imageFeatures(decodeImage(pngBytes(gray, "png")))
    assert(f.toSeq === Seq(127.5f, 0f, 255f))
    assert(resizeNearest(img, 1, 1).pixels.map(_ & 0xFF).toSeq === Seq(76))
  }

  test("image pipeline accepts mixed GRFT and PNG payloads in one column") {
    import spark.implicits._
    val gray = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 16).foreach(i => gray.getRaster.setSample(i % 4, i / 4, 0, i * 16))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "png", bos)
    val rows = Seq(
      (1L, syntheticImageBytes(1, 4, 4)),
      (2L, bos.toByteArray),
      (3L, Array[Byte](1, 2, 3, 4))) // undecodable
    val out = imagePipeline(rows.toDF("id", "media"), "media").cache()
    assert(out.where($"media_error".isNotNull).select("id")
      .head().getLong(0) === 3L)
    val png = out.where($"id" === 2).select("media_w", "media_h", "features").head()
    assert(png.getInt(0) === 4 && png.getInt(1) === 4)
    assert(png.getSeq[Float](2)(1) === 0f && png.getSeq[Float](2)(2) === 240f)
    out.unpersist()
  }

  test("batched image pipeline: decode + resize + features, bad rows to side output") {
    import spark.implicits._
    val rows = (1L to 20L).map(i => (i, syntheticImageBytes(i, 8, 8))) :+
      (99L, Array[Byte](0, 0, 0, 0))
    val df = rows.toDF("id", "media")
    val out = imagePipeline(df, "media", resizeTo = Some((4, 4)), batchSize = 6).cache()

    assert(out.where($"media_error".isNotNull).select("id")
      .head().getLong(0) === 99L)
    val good = out.where($"media_error".isNull)
    assert(good.count() === 20)
    assert(good.select("media_w").distinct().head().getInt(0) === 4)
    val f = good.where($"id" === 1).select("features").head().getSeq[Float](0)
    assert(f.length === 3)
    // mean within byte range, min <= mean <= max
    assert(f(1) <= f(0) && f(0) <= f(2))
    out.unpersist()
  }

  test("image embedding: media column → visual encoder, failures routed") {
    import spark.implicits._
    import graft.embed.{EmbeddingPipeline, HashEmbeddingRuntime, HashVisualSessionFactory, OrtEmbeddingRuntime}
    val rows = (1L to 10L).map(i => (i, syntheticImageBytes(i, 4, 3))) :+
      (99L, Array[Byte](9, 9, 9, 9))
    val df = rows.toDF("id", "media")
    val rt = new OrtEmbeddingRuntime(HashVisualSessionFactory)
    val out = EmbeddingPipeline.createImageEmbeddings(
      df, "media", rt, "clip/ViT-B-32-visual", batchSizeOverride = 4).cache()

    val bad = EmbeddingPipeline.failedRows(out)
    assert(bad.select("id").head().getLong(0) === 99L)
    assert(bad.head().getAs[String](EmbeddingPipeline.ErrorCol).startsWith("decode:"))
    val good = EmbeddingPipeline.embeddedRows(out)
    assert(good.count() === 10)

    // embedding = embedFromHash(Σ pixel_i·(i+1) mod M, 512), bit-exact
    val px = decodeImage(syntheticImageBytes(1, 4, 3)).pixels.map(_ & 0xFF)
    val h = px.zipWithIndex.map { case (p, i) => p.toLong * (i + 1) }.sum %
      HashEmbeddingRuntime.Mod
    val expected = HashEmbeddingRuntime.embedFromHash(h, 512)
    val got = good.where($"id" === 1)
      .select(EmbeddingPipeline.EmbeddingCol).head().getSeq[Float](0)
    assert(got.length === 512)
    assert(got.toArray.sameElements(expected))

    // resize path: embedding computed over the RESIZED pixels
    val resized = EmbeddingPipeline.createImageEmbeddings(
      df.where($"id" === 1), "media", rt, "clip/ViT-B-32-visual",
      resizeTo = Some((2, 2)))
    val rpx = resizeNearest(decodeImage(syntheticImageBytes(1, 4, 3)), 2, 2)
      .pixels.map(_ & 0xFF)
    val rh = rpx.zipWithIndex.map { case (p, i) => p.toLong * (i + 1) }.sum %
      HashEmbeddingRuntime.Mod
    val rGot = resized.select(EmbeddingPipeline.EmbeddingCol).head().getSeq[Float](0)
    assert(rGot.toArray.sameElements(HashEmbeddingRuntime.embedFromHash(rh, 512)))
    out.unpersist()
  }

  test("WAV roundtrip: synthetic PCM16 decodes to the exact formula samples") {
    val a = Multimodal.decodeWav(Multimodal.syntheticWavBytes(7L, 100, 8000))
    assert(a.sampleRate == 8000 && a.samples.length == 100)
    (0 until 100).foreach { i =>
      val s = ((7L * 31 + i.toLong * 7919) % 65536 - 32768).toInt
      assert(a.samples(i) == s / 32768.0f, s"sample $i")
    }
  }

  test("stereo WAV folds to mono by channel average") {
    // hand-build a 2-channel PCM16 WAV: L = 16384, R = -16384 → mono 0;
    // then L = 8192, R = 8192 → mono 0.25
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val frames = Seq((16384, -16384), (8192, 8192))
    val pcm = frames.flatMap { case (l, r) =>
      Seq(l & 0xff, (l >> 8) & 0xff, r & 0xff, (r >> 8) & 0xff).map(_.toByte)
    }.toArray
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.size.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val a = Multimodal.decodeWav(out.toByteArray)
    assert(a.samples.toSeq == Seq(0.0f, 0.25f))
  }

  test("GVID with genuine JPEG frames decodes per-frame via ImageIO") {
    val clip = Multimodal.jpegVideoBytes(3L, 8, 6, 4)
    val frames = Multimodal.decodeVideo(clip)
    assert(frames.size == 4)
    assert(frames.forall(f => f.width == 8 && f.height == 6))
    // each frame must byte-match the single-image ImageIO decode of the
    // same JPEG payload (the MJPEG contract: container adds nothing)
    val bb = java.nio.ByteBuffer.wrap(clip)
    bb.getInt(); bb.getInt()
    (0 until 4).foreach { i =>
      val b = new Array[Byte](bb.getInt()); bb.get(b)
      // genuine JPEG bytes: SOI marker
      assert((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8, s"frame $i not JPEG")
      assert(frames(i).pixels.sameElements(Multimodal.decodeImage(b).pixels))
    }
    // and a mixed clip: fixture + JPEG frames in one container
    val mixed = Multimodal.packVideo(Seq(
      Multimodal.syntheticImageBytes(1L, 4, 3),
      Multimodal.jpegVideoBytes(1L, 4, 3, 1).drop(12))) // strip GVID header+len
    val mf = Multimodal.decodeVideo(mixed)
    assert(mf.size == 2 && mf.forall(f => f.width == 4 && f.height == 3))
  }

  test("videoPipeline: frame sampling stats match hand computation") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticVideoBytes(1L, 4, 3, 3)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    val out = Multimodal.videoPipeline(df, "media", everyN = 2)
      .select("id", "n_frames", "n_sampled", "pmin", "pmax", "psum", "media_error")
      .collect().map(r => r.getLong(0) -> r).toMap
    // frames 0 and 2 sampled; pixels (seed+f)*7 + i*13 mod 256
    val expected = Seq(1L, 3L).flatMap(seed =>
      (0 until 12).map(i => ((seed * 7 + i * 13) % 256).toInt))
    assert(out(1L).getInt(1) == 3 && out(1L).getInt(2) == 2)
    assert(out(1L).getInt(3) == expected.min && out(1L).getInt(4) == expected.max)
    assert(out(1L).getLong(5) == expected.map(_.toLong).sum)
    assert(out(1L).isNullAt(6))
    assert(out(2L).isNullAt(1) && !out(2L).isNullAt(6))
  }

  test("decodePcm: unsigned 16-bit re-centers instead of wrapping") {
    // samples stored as value+32768: 32768 → 0.0, 49152 → +0.5,
    // 16384 → −0.5. Signed interpretation would wrap 49152 to −0.5.
    val vals = Seq(32768, 49152, 16384)
    val pcm = vals.flatMap(v =>
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, vals.size.toLong)
    val a = Multimodal.decodePcm(ais)
    assert(a.samples.toSeq == Seq(0.0f, 0.5f, -0.5f))
  }

  test("audioFeatures: hand-computed peak, rms, zero crossings") {
    val a = Multimodal.Audio(8000, Array(0.5f, -0.5f, 0.5f, 0.0f, -0.5f))
    val f = Multimodal.audioFeatures(a)
    assert(f(0) == 5.0 && f(1) == 0.5)
    assert(math.abs(f(2) - math.sqrt(4 * 0.25 / 5)) < 1e-12)
    // crossings at (0,1), (1,2); (2,3) and (3,4) involve a zero → not counted
    assert(f(3) == 2.0 / 4)
  }

  test("resampleLinear halves and doubles sample counts sanely") {
    val a = Multimodal.Audio(8000, Array.tabulate(80)(i => i / 80.0f))
    val down = Multimodal.resampleLinear(a, 4000)
    assert(down.sampleRate == 4000 && down.samples.length == 40)
    val up = Multimodal.resampleLinear(a, 16000)
    assert(up.samples.length == 160)
    // a linear ramp stays a ramp under linear interpolation
    assert(math.abs(up.samples(100) - 50 / 80.0f) < 1e-6)
  }

  test("audio pipeline routes corrupt payloads to the error column") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticWavBytes(1L, 60, 8000)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    val out = Multimodal.audioPipeline(df, "media")
      .select("id", "n_samples", "media_error").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).get(1) == 60 && out(1L).isNullAt(2))
    assert(out(2L).isNullAt(1) && !out(2L).isNullAt(2))
  }
}

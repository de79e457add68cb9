package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines at 100 TB: media rides as opaque `binary` columns with
  * typed metadata structs; decode / resize / feature-extract /
  * frame-sample run as batched `mapPartitions` transforms (map-side,
  * shuffle-free, batch size bounds peak memory per task).
  *
  * IMAGE decode is real: `decodeImage` routes non-fixture payloads
  * through the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF — ships with
  * the JDK, zero new dependencies), reduced to one BT.601 luma byte
  * per pixel; the deterministic GRFT fixture format produced by
  * `syntheticImageBytes` still parses exactly and remains the
  * SQL-recomputable oracle path. VIDEO rides the GVID container — a
  * trivial MJPEG-style layout whose length-prefixed frames each route
  * through `decodeImage`, so genuine JPEG frames decode for real via
  * ImageIO ([[jpegVideoBytes]] builds such clips); inter-frame-coded
  * codecs (h264 etc.) have no JDK decoder — swap jcodec/ffmpeg
  * bindings behind `decodeVideo` in production. Everything downstream
  * of decode — schemas, batching, nearest-neighbor resize, channel
  * statistics, frame sampling — runs on the decoded pixels either way.
  */
object Multimodal {

  val ImageMagic = 0x47494D47 // "GIMG"
  val VideoMagic = 0x47564944 // "GVID"

  /** Decoded image: dims + one byte per pixel (single channel). */
  case class Image(width: Int, height: Int, pixels: Array[Byte])

  val imageStruct: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixels", BinaryType)))

  // ------------------------------------------------------- fixtures

  /** Deterministic fake "image": header (magic, w, h) + pixels where
    * pixel(i) = (seed*7 + i*13) mod 256 — reproducible in plain SQL.
    */
  def syntheticImageBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + w * h)
    bb.putInt(ImageMagic).putInt(w).putInt(h)
    var i = 0
    while (i < w * h) { bb.put((((seed * 7 + i * 13) % 256 + 256) % 256).toByte); i += 1 }
    bb.array()
  }

  /** Pack frame payloads into the GVID container — a trivial
    * MJPEG-style layout (magic, frame count, then length-prefixed
    * frame payloads). Frames are ANY [[decodeImage]]-supported bytes:
    * genuine JPEG/PNG/BMP/GIF or the GIMG fixture, so an MJPEG clip is
    * literally JPEG frames in this wrapper. */
  def packVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    bb.putInt(VideoMagic).putInt(frames.size)
    frames.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  /** Deterministic fake "video": GVID of fixture frames with seed+frameIdx. */
  def syntheticVideoBytes(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] =
    packVideo((0 until frames).map(f => syntheticImageBytes(seed + f, w, h)))

  /** Genuine-JPEG video: GVID of real ImageIO-encoded grayscale JPEG
    * frames (frame f's source pixels follow the fixture formula with
    * seed+f). JPEG is lossy, so decoded pixels are NOT the formula —
    * gates verify the video path against per-frame [[decodeImage]] of
    * the same bytes instead. */
  def jpegVideoBytes(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] =
    packVideo((0 until frames).map { f =>
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < w * h) {
        bi.getRaster.setSample(i % w, i / w, 0,
          ((((seed + f) * 7 + i * 13) % 256 + 256) % 256).toInt)
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "jpg", out)
      out.toByteArray
    })

  // --------------------------------------------------------- decode

  /** Decode an image payload. GIMG-magic bytes parse as the
    * deterministic fixture (the SQL-recomputable oracle path); any
    * other payload goes through `javax.imageio.ImageIO` — PNG, JPEG,
    * BMP and GIF decode with the stock JDK — and is reduced to one
    * luma byte per pixel with integer BT.601 weights
    * ((299·R + 587·G + 114·B + 500) / 1000), so the single-channel
    * pipeline downstream is identical for real and fixture images.
    */
  def decodeImage(bytes: Array[Byte]): Image = {
    require(bytes != null && bytes.length >= 4, "graft: empty image payload")
    if (java.nio.ByteBuffer.wrap(bytes).getInt() == ImageMagic)
      decodeFixtureImage(bytes)
    else {
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(bi != null,
        "graft: undecodable image payload (not GIMG and no ImageIO reader)")
      val w = bi.getWidth; val h = bi.getHeight
      val px = new Array[Byte](w * h)
      if (bi.getRaster.getNumBands == 1) {
        // grayscale: read raw samples — getRGB would route them
        // through the linear-gray → sRGB color-space transform and
        // bend the stored values (51 comes back as 124)
        val raster = bi.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = raster.getSample(x, y, 0).toByte
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = bi.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            px(y * w + x) = ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
            x += 1
          }
          y += 1
        }
      }
      Image(w, h, px)
    }
  }

  private def decodeFixtureImage(bytes: Array[Byte]): Image = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == ImageMagic, "graft: not a GIMG payload")
    val w = bb.getInt(); val h = bb.getInt()
    val px = new Array[Byte](w * h)
    bb.get(px)
    Image(w, h, px)
  }

  def decodeVideo(bytes: Array[Byte]): Seq[Image] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == VideoMagic, "graft: not a GVID payload")
    val n = bb.getInt()
    (0 until n).map { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      decodeImage(b)
    }
  }

  // ------------------------------------------------ real transforms

  /** Nearest-neighbor resize (real math over decoded pixels). */
  def resizeNearest(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, "graft: resize dims must be positive")
    val out = new Array[Byte](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y * img.height / newH
      var x = 0
      while (x < newW) {
        out(y * newW + x) = img.pixels(sy * img.width + (x * img.width / newW))
        x += 1
      }
      y += 1
    }
    Image(newW, newH, out)
  }

  /** Channel statistics feature vector: [mean, min, max] over pixels
    * as unsigned bytes — the feature-extraction slot of the pipeline.
    */
  def imageFeatures(img: Image): Array[Float] = {
    var sum = 0.0; var mn = 255; var mx = 0
    img.pixels.foreach { b =>
      val v = b & 0xFF
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
    }
    Array((sum / img.pixels.length).toFloat, mn.toFloat, mx.toFloat)
  }

  /** Every-nth frame sample (video → images). */
  def sampleFrames(frames: Seq[Image], everyN: Int): Seq[Image] = {
    require(everyN > 0, "graft: frame stride must be positive")
    frames.zipWithIndex.collect { case (f, i) if i % everyN == 0 => f }
  }

  // ---------------------------------------------- batched pipeline

  /** Decode + resize + featurize a binary image column in one batched
    * mapPartitions pass. Appends: `media_w`, `media_h`, `features`
    * (array<float>), `media_error` (null on success) — failed decodes
    * are a side output, like the embedding pipeline.
    */
  // ---------------------------------------------------------------
  // AUDIO — decode is REAL via the JDK's javax.sound.sampled (RIFF/
  // WAV, PCM 8/16-bit, mono/stereo — ships with the JDK headless,
  // zero new dependencies). Stereo folds to mono by channel average;
  // compressed containers (mp3/ogg) have no JDK codec — swap a codec
  // behind decodeWav in production, everything downstream is format-
  // independent.
  // ---------------------------------------------------------------

  /** Decoded clip: sample rate + mono samples in [-1, 1). */
  case class Audio(sampleRate: Int, samples: Array[Float])

  /** Deterministic synthetic clip encoded as a REAL PCM16 WAV via
    * AudioSystem — sample i is the int16 value
    * `((seed·31 + i·7919) mod 65536) − 32768`, so the decoded floats
    * are exactly `v/32768` and a SQL oracle can regenerate them. */
  def syntheticWavBytes(seed: Long, n: Int, rate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (((seed * 31 + i.toLong * 7919) % 65536) - 32768).toInt
      pcm(2 * i) = (v & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV payload to mono float samples. PCM_SIGNED 16-bit
    * little-endian and PCM 8-bit both handled; stereo averages
    * channels. Throws on non-audio bytes (callers batch through
    * [[audioPipeline]], which captures per-row errors). */
  def decodeWav(bytes: Array[Byte]): Audio = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try decodePcm(ais) finally ais.close()
  }

  /** PCM sample decode shared by [[decodeWav]]; package-visible so the
    * unsigned/endian branches are testable with synthetic streams
    * (javax WAV parsing never yields PCM_UNSIGNED 16-bit, other
    * containers can). */
  private[multimodal] def decodePcm(
      ais: javax.sound.sampled.AudioInputStream): Audio = {
    {
      val fmt = ais.getFormat
      require(
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        s"graft: unsupported audio encoding ${fmt.getEncoding}")
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16, s"graft: unsupported bit depth $bits")
      val ch = fmt.getChannels
      val raw = ais.readAllBytes()
      val frameBytes = fmt.getFrameSize
      val nFrames = raw.length / frameBytes
      val out = new Array[Float](nFrames)
      val signed =
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      var f = 0
      while (f < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < ch) {
          val base = f * frameBytes + c * (bits / 8)
          val v =
            if (bits == 16) {
              val lo = raw(base) & 0xff
              val hi = raw(base + 1).toInt
              val s = if (fmt.isBigEndian) (raw(base).toInt << 8) | (raw(base + 1) & 0xff)
                      else (hi << 8) | lo
              // Unsigned 16-bit stores sample+32768 in [0,65535]: mask
              // the sign-extension and re-center, or samples decode
              // wrapped (loud clicks) instead of erroring.
              val sv = if (signed) s else (s & 0xffff) - 32768
              sv / 32768.0f
            } else {
              val b = raw(base) & 0xff
              if (signed) raw(base).toInt / 128.0f else (b - 128) / 128.0f
            }
          acc += v
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      Audio(fmt.getSampleRate.toInt, out)
    }
  }

  /** Clip features: [n_samples, peak, rms, zero-crossing rate] —
    * double accumulation in index order (SQL-replayable). */
  def audioFeatures(a: Audio): Array[Double] = {
    val n = a.samples.length
    var peak = 0.0
    var ss = 0.0
    var zc = 0
    var i = 0
    while (i < n) {
      val v = a.samples(i).toDouble
      val av = math.abs(v)
      if (av > peak) peak = av
      ss += v * v
      if (i > 0 && (a.samples(i - 1) < 0) != (v < 0) &&
        (a.samples(i - 1) != 0f && v != 0f)) zc += 1
      i += 1
    }
    Array(
      n.toDouble,
      peak,
      if (n == 0) 0.0 else math.sqrt(ss / n),
      if (n <= 1) 0.0 else zc.toDouble / (n - 1))
  }

  /** Linear-interpolation resample (rate conversion for encoder
    * frontends that expect a fixed rate, e.g. 16 kHz). */
  def resampleLinear(a: Audio, newRate: Int): Audio = {
    require(newRate > 0, s"graft: bad target rate $newRate")
    if (newRate == a.sampleRate || a.samples.isEmpty)
      return Audio(newRate, a.samples)
    val n = math.max(1,
      (a.samples.length.toLong * newRate / a.sampleRate).toInt)
    val out = new Array[Float](n)
    val step = a.sampleRate.toDouble / newRate
    var i = 0
    while (i < n) {
      val pos = i * step
      val j = pos.toInt
      val frac = (pos - j).toFloat
      val x0 = a.samples(math.min(j, a.samples.length - 1))
      val x1 = a.samples(math.min(j + 1, a.samples.length - 1))
      out(i) = x0 + (x1 - x0) * frac
      i += 1
    }
    Audio(newRate, out)
  }

  /** Decode + featurize a binary WAV column in one batched map-side
    * pass — same shape/error contract as [[imagePipeline]]. */
  def audioPipeline(
      df: DataFrame,
      binCol: String,
      resampleTo: Option[Int] = None,
      batchSize: Int = 256): DataFrame = {
    val schema = df.schema
      .add("sample_rate", IntegerType).add("n_samples", IntegerType)
      .add("afeatures", ArrayType(DoubleType))
      .add("media_error", StringType)
    val idx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          try {
            val a0 = decodeWav(r.getAs[Array[Byte]](idx))
            val a = resampleTo.fold(a0)(resampleLinear(a0, _))
            Row.fromSeq(r.toSeq ++ Seq(a.sampleRate, a.samples.length,
              audioFeatures(a).toSeq, null))
          } catch {
            case e: Exception =>
              Row.fromSeq(r.toSeq ++ Seq(null, null, null, e.getMessage))
          }
        }
      }
    }(enc)
  }

  /** Decode + frame-sample + featurize a binary VIDEO column in one
    * batched map-side pass (same shape as [[imagePipeline]]): every
    * `everyN`-th frame contributes to the clip's pixel statistics.
    * Appends `n_frames`, `n_sampled`, `pmin`/`pmax`/`psum` over the
    * sampled frames' unsigned pixels, and `media_error` (null on
    * success). Frames decode through [[decodeImage]], so a clip may
    * mix genuine JPEG/PNG frames with GIMG fixtures. */
  def videoPipeline(
      df: DataFrame,
      binCol: String,
      everyN: Int = 2,
      batchSize: Int = 64): DataFrame = {
    val schema = df.schema
      .add("n_frames", IntegerType).add("n_sampled", IntegerType)
      .add("pmin", IntegerType).add("pmax", IntegerType)
      .add("psum", LongType)
      .add("media_error", StringType)
    val idx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          try {
            val frames = decodeVideo(r.getAs[Array[Byte]](idx))
            val sampled = sampleFrames(frames, everyN)
            var mn = 255; var mx = 0; var sum = 0L
            sampled.foreach(_.pixels.foreach { b =>
              val v = b & 0xFF
              if (v < mn) mn = v; if (v > mx) mx = v; sum += v
            })
            Row.fromSeq(r.toSeq ++ Seq(frames.size, sampled.size,
              if (sampled.isEmpty) null else mn,
              if (sampled.isEmpty) null else mx, sum, null))
          } catch {
            case e: Exception =>
              // BufferUnderflow etc. carry a null message — keep the
              // error column non-null so failed rows stay identifiable
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, msg))
          }
        }
      }
    }(enc)
  }

  def imagePipeline(
      df: DataFrame,
      binCol: String,
      resizeTo: Option[(Int, Int)] = None,
      batchSize: Int = 256): DataFrame = {
    val schema = df.schema
      .add("media_w", IntegerType).add("media_h", IntegerType)
      .add("features", ArrayType(FloatType))
      .add("media_error", StringType)
    val idx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          try {
            val img0 = decodeImage(r.getAs[Array[Byte]](idx))
            val img = resizeTo.fold(img0) { case (w, h) => resizeNearest(img0, w, h) }
            Row.fromSeq(r.toSeq ++ Seq(img.width, img.height,
              imageFeatures(img).toSeq, null))
          } catch {
            case e: Exception =>
              Row.fromSeq(r.toSeq ++ Seq(null, null, null, e.getMessage))
          }
        }
      }
    }(enc)
  }
}

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
}

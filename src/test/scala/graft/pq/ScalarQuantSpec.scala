package graft.pq

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ScalarQuantSpec extends SparkTestBase {

  test("f16 golden values roundtrip") {
    val goldens = Seq(
      0f -> 0x0000, 1f -> 0x3C00, -1f -> 0xBC00, 2f -> 0x4000,
      0.5f -> 0x3800, 65504f -> 0x7BFF, // max finite half
      Float.PositiveInfinity -> 0x7C00, Float.NegativeInfinity -> 0xFC00)
    goldens.foreach { case (f, bits) =>
      assert((ScalarQuantizer.toF16(f) & 0xFFFF) === bits, s"toF16($f)")
      assert(ScalarQuantizer.fromF16(bits.toShort) === f, s"fromF16($bits)")
    }
    // overflow → inf
    assert((ScalarQuantizer.toF16(1e6f) & 0xFFFF) === 0x7C00)
    // nan stays nan
    assert(ScalarQuantizer.fromF16(ScalarQuantizer.toF16(Float.NaN)).isNaN)
  }

  test("f16 roundtrip error is within half-precision ulp (1000 random floats)") {
    val rng = new java.util.Random(42)
    (1 to 1000).foreach { _ =>
      val f = (rng.nextFloat() - 0.5f) * 200f
      val back = ScalarQuantizer.fromF16(ScalarQuantizer.toF16(f))
      // half precision has 11 significand bits → rel err <= 2^-11
      assert(math.abs(back - f) <= math.max(math.abs(f) / 1024.0, 1e-4), s"f=$f back=$back")
    }
  }

  test("f16 exactly-representable values roundtrip exactly") {
    Seq(0.25f, 1.5f, -3.75f, 1024f).foreach { f =>
      assert(ScalarQuantizer.fromF16(ScalarQuantizer.toF16(f)) === f)
    }
  }

  test("i8 quantization: clamped, monotone, bounded error") {
    val v = Array(-2f, -1f, -0.5f, 0f, 0.5f, 1f, 2f)
    val q = ScalarQuantizer.quantizeI8(v)
    assert(q(0) === q(1), "out-of-range clamps to lo")
    assert(q(5) === q(6), "out-of-range clamps to hi")
    assert(q.toSeq === q.toSeq.sorted, "monotone")
    val back = ScalarQuantizer.dequantizeI8(q)
    v.zip(back).drop(1).dropRight(1).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 2.0 / 255 + 1e-6, s"$x -> $y")
    }
  }

  test("b1 packs sign bits MSB-first, feeds hamming_dist") {
    import spark.implicits._
    import graft.functions.hamming_dist
    val a = Array.fill(40)(1f)
    val b = Array.tabulate(40)(i => if (i < 3) -1f else 1f)
    val pa = ScalarQuantizer.quantizeB1(a)
    val pb = ScalarQuantizer.quantizeB1(b)
    assert(pa.length === 2)
    assert(pa(0) === 0xFFFFFFFF && (pa(1) >>> 24) === 0xFF)
    val df = Seq((pa.toSeq, pb.toSeq)).toDF("x", "y")
    assert(df.select(hamming_dist($"x", $"y")).head().getInt(0) === 3)
  }

  test("column transforms run distributed") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.25f, -0.5f))).toDF("id", "v")
    val out = df.select(
      ScalarQuantizer.dequantize_f16(ScalarQuantizer.quantize_f16($"v")).as("v16"),
      ScalarQuantizer.quantize_i8($"v").as("v8"),
      ScalarQuantizer.quantize_b1($"v").as("v1"))
      .head()
    assert(out.getSeq[Float](0) === Seq(0.25f, -0.5f))
    assert(out.getSeq[Byte](1).length === 2)
    assert(out.getSeq[Int](2) === Seq(Integer.MIN_VALUE)) // bit0 set only
  }

  test("conf surface reads spark.graft.* with reference defaults") {
    import graft.GraftConf
    assert(GraftConf.bm25K1(spark) === 1.2)
    assert(GraftConf.bm25B(spark) === 0.75)
    assert(GraftConf.bm25ApproxThreshold(spark) === 8000)
    assert(GraftConf.annInitK(spark) === 10)
    assert(GraftConf.annParams(spark).m === 16)
    spark.conf.set(GraftConf.Bm25K1, "0.9")
    spark.conf.set(GraftConf.AnnEf, "128")
    try {
      assert(GraftConf.bm25K1(spark) === 0.9)
      assert(GraftConf.annParams(spark).ef === 128)
    } finally {
      spark.conf.unset(GraftConf.Bm25K1)
      spark.conf.unset(GraftConf.AnnEf)
    }
  }
}

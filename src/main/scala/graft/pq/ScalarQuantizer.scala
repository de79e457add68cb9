package graft.pq

import org.apache.spark.sql.Column

/** Index-time scalar quantization of vector elements — the reference's
  * `quant_bits` reloption mapping to usearch scalar kinds f16/i8/b1
  * (lantern_hnsw/src/hnsw/options.c:137-158; server side
  * lantern_cli/src/external_index/server.rs:94-101).
  *
  *  - f16: IEEE 754 half precision, round-to-nearest-even — 2 bytes/elem.
  *  - i8 : linear min-max into [-128, 127] over a caller-provided range
  *    (default [-1, 1]) — 1 byte/elem. Encoding uses floor(x + 0.5) so
  *    the same formula is reproducible in any SQL engine (no HALF_UP vs
  *    banker's ambiguity).
  *  - b1 : sign bits packed 32-per-int, MSB-first — compatible with the
  *    engine's packed-bit `hamming_dist` (hnsw.c:308-319 semantics).
  */
object ScalarQuantizer {

  // ------------------------------------------------------------- f16

  /** Float32 → IEEE half bits (round-to-nearest-even), standard
    * algorithm (JDK 20's Float.floatToFloat16 is unavailable on 17).
    */
  def toF16(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp = (bits >>> 23) & 0xFF
    val mant = bits & 0x7FFFFF
    if (exp == 0xFF) { // inf / nan
      (sign | 0x7C00 | (if (mant != 0) 0x200 else 0)).toShort
    } else {
      val e = exp - 127 + 15
      if (e >= 0x1F) (sign | 0x7C00).toShort // overflow → inf
      else if (e <= 0) { // subnormal / underflow
        if (e < -10) sign.toShort
        else {
          // round to nearest even on the 13 dropped bits
          val m = (mant | 0x800000) >>> (1 - e)
          val r = (m >>> 13) + (if ((m & 0x1FFF) > 0x1000 ||
            ((m & 0x1FFF) == 0x1000 && ((m >>> 13) & 1) == 1)) 1 else 0)
          (sign | r).toShort
        }
      } else {
        val half = sign | (e << 10) | (mant >>> 13)
        val rest = mant & 0x1FFF
        val r = half + (if (rest > 0x1000 || (rest == 0x1000 && (half & 1) == 1)) 1 else 0)
        r.toShort
      }
    }
  }

  /** IEEE half bits → float32 (exact). */
  def fromF16(h: Short): Float = {
    val hh = h & 0xFFFF
    val sign = (hh & 0x8000) << 16
    val exp = (hh >>> 10) & 0x1F
    val mant = hh & 0x3FF
    val bits =
      if (exp == 0x1F) sign | 0x7F800000 | (mant << 13) // inf/nan
      else if (exp == 0) {
        if (mant == 0) sign
        else { // subnormal: normalize
          var e = -1
          var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3FF) << 13)
        }
      } else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  def quantizeF16(v: Array[Float]): Array[Short] = v.map(toF16)
  def dequantizeF16(v: Array[Short]): Array[Float] = v.map(fromF16)

  // -------------------------------------------------------------- i8

  /** Linear [lo, hi] → [-128, 127]; clamped, tie-free floor(x+0.5). */
  def quantizeI8(v: Array[Float], lo: Float = -1f, hi: Float = 1f): Array[Byte] = {
    require(hi > lo, s"graft: invalid i8 range [$lo, $hi]")
    val scale = 255.0 / (hi - lo)
    v.map { x =>
      val clamped = math.min(math.max(x, lo), hi)
      val q = math.floor((clamped - lo) * scale + 0.5) - 128.0
      math.min(math.max(q, -128.0), 127.0).toByte
    }
  }

  def dequantizeI8(v: Array[Byte], lo: Float = -1f, hi: Float = 1f): Array[Float] = {
    val scale = (hi - lo) / 255.0
    v.map(q => (lo + (q.toInt + 128) * scale).toFloat)
  }

  // -------------------------------------------------------------- b1

  /** Sign bits (x > 0) packed 32 per int, MSB-first — output feeds
    * `hamming_dist` directly. */
  def quantizeB1(v: Array[Float]): Array[Int] = {
    val out = new Array[Int]((v.length + 31) / 32)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i / 32) |= (1 << (31 - (i % 32)))
      i += 1
    }
    out
  }

  // ---------------------------------------------------- packed 1/2/4

  /** Linear [lo, hi] quantization to `nbits`-wide codes (nbits ∈
    * {1, 2, 4}) packed MSB-first, 8/nbits codes per byte — the
    * remaining `quant_bits` points of the reference's {1,2,4,8,16,32}
    * set (lantern_hnsw/src/hnsw/options.c:137-158). Levels are the
    * 2^nbits evenly spaced points of [lo, hi]; encoding is the same
    * clamped tie-free floor(x·scale + 0.5) the i8 path uses. Distinct
    * from [[quantizeB1]]: that packs SIGN bits for `hamming_dist`,
    * this stores 2^nbits reconstruction LEVELS for float metrics. */
  def quantizePacked(
      v: Array[Float], nbits: Int,
      lo: Float = -1f, hi: Float = 1f): Array[Byte] = {
    require(nbits == 1 || nbits == 2 || nbits == 4,
      s"graft: packed nbits must be 1|2|4, got $nbits")
    require(hi > lo, s"graft: invalid packed range [$lo, $hi]")
    val levels = (1 << nbits) - 1
    val scale = levels / (hi - lo).toDouble
    val per = 8 / nbits
    val out = new Array[Byte]((v.length + per - 1) / per)
    var i = 0
    while (i < v.length) {
      val clamped = math.min(math.max(v(i), lo), hi)
      val q = math.min(
        math.max(math.floor((clamped - lo) * scale + 0.5), 0.0),
        levels.toDouble).toInt
      val shift = 8 - nbits * (i % per + 1)
      out(i / per) = (out(i / per) | (q << shift)).toByte
      i += 1
    }
    out
  }

  /** Code of element `i` in an MSB-first packed array. */
  @inline def packedCode(codes: Array[Byte], i: Int, nbits: Int): Int = {
    val per = 8 / nbits
    val shift = 8 - nbits * (i % per + 1)
    (codes(i / per) >>> shift) & ((1 << nbits) - 1)
  }

  def dequantizePacked(
      codes: Array[Byte], dim: Int, nbits: Int,
      lo: Float = -1f, hi: Float = 1f): Array[Float] = {
    val step = (hi - lo).toDouble / ((1 << nbits) - 1)
    Array.tabulate(dim)(i => (lo + packedCode(codes, i, nbits) * step).toFloat)
  }

  /** Snap a float vector to its stored-scalar representation for a
    * quant kind — the CANONICAL encode→decode round-trip
    * [[graft.ann.HnswGraph]] applies at insert (quantized traversal,
    * reference quant_bits semantics) and the hnsw validator re-derives
    * against. One implementation so build, search, and validation can
    * never drift. */
  def snap(v: Array[Float], quant: String,
      lo: Float = -1f, hi: Float = 1f): Array[Float] = quant match {
    case "f32" => v
    case "f16" => v.map(x => fromF16(toF16(x)))
    case "i8" => dequantizeI8(quantizeI8(v, lo, hi), lo, hi)
    case "b4" | "b2" | "b1" =>
      val nbits = quant match { case "b4" => 4; case "b2" => 2; case _ => 1 }
      dequantizePacked(quantizePacked(v, nbits, lo, hi), v.length, nbits,
        lo, hi)
    case other => throw new IllegalArgumentException(
      s"graft: unsupported quant '$other' (expected f32|f16|i8|b4|b2|b1)")
  }

  /** [[snap]] over Catalyst array data — the static the codegen'd
    * [[graft.functions.SnapQuantExpr]] calls. */
  def snapArray(a: org.apache.spark.sql.catalyst.util.ArrayData,
      quant: String, lo: Float, hi: Float)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(snap(a.toFloatArray(), quant, lo, hi))

  // --------------------------------------------------------- columns
  // Native codegen'd expressions (graft.functions.QuantExpressions) —
  // the earlier Scala-UDF forms paid per-row ser/de and blocked
  // whole-stage codegen (scalar_quant_i8 measured ~1.2s at sf0.1 on
  // 2,000 rows, almost entirely UDF overhead).

  import org.apache.spark.sql.graftshim.GraftSqlShim.{column => gcol, expression => gex}
  import graft.functions.{DequantizeF16Expr, DequantizeI8Expr, QuantizeB1Expr, QuantizeF16Expr, QuantizeI8Expr}

  def quantize_f16(c: Column): Column = gcol(QuantizeF16Expr(gex(c)))
  def dequantize_f16(c: Column): Column = gcol(DequantizeF16Expr(gex(c)))
  def quantize_i8(c: Column, lo: Float = -1f, hi: Float = 1f): Column =
    gcol(QuantizeI8Expr(gex(c), lo, hi))
  def dequantize_i8(c: Column, lo: Float = -1f, hi: Float = 1f): Column =
    gcol(DequantizeI8Expr(gex(c), lo, hi))
  def quantize_b1(c: Column): Column = gcol(QuantizeB1Expr(gex(c)))
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.pq.ScalarQuantizer

/** Build-path vector transforms as native codegen'd expressions.
  *
  * These replace per-row Scala UDFs in the hot build paths (IVF list
  * assignment / normalization, scalar quantization columns): a UDF
  * pays catalyst→scala ser/de per row and blocks whole-stage codegen —
  * measurable at thousands of rows and ruinous at 100 TB build scale.
  */
abstract class FloatVecUnaryExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
}

/** Unit-normalize (zero-norm vectors pass through unchanged). */
case class UnitNormalize(child: Expression) extends FloatVecUnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "unit_normalize"

  override def nullSafeEval(v: Any): Any =
    UnitNormalize.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnitNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): UnitNormalize =
    copy(child = newChild)
}

object UnitNormalize {
  def compute(a: ArrayData): ArrayData = {
    val v = a.toFloatArray()
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) return ArrayData.toArrayData(v)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
    ArrayData.toArrayData(out)
  }
}

/** Dense matrix-vector product `M · v` (M rides the expression as a
  * reference object, `dimOut × dimIn` doubles) — the projection kernel
  * for random-projection / learned-loading dimensionality reduction
  * without a per-row UDF. Each output coordinate is a SEQUENTIAL
  * left-to-right sum, the same order a SQL `list_sum(list_transform)`
  * replay accumulates in, so oracles reproduce the doubles. */
case class MatVecProject(
    child: Expression,
    matrix: Array[Array[Double]],
    bias: Array[Double] = null,
    scale: Array[Double] = null)
    extends FloatVecUnaryExpression {
  require(matrix.nonEmpty && matrix.head.nonEmpty,
    "graft: mat_vec_project needs a non-empty matrix")
  require(bias == null || bias.length == matrix.length,
    "graft: bias length must equal output dims")
  require(scale == null || scale.length == matrix.length,
    "graft: scale length must equal output dims")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec_project"

  @transient private lazy val table = MatVecProject.Table(matrix, bias, scale)

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<matrix(${matrix.length}x${matrix.head.length})>" +
      (if (bias != null) "+bias" else "") +
      (if (scale != null) "+scale" else ""))

  override def nullSafeEval(v: Any): Any =
    MatVecProject.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projMatrix", table,
      "graft.functions.MatVecProject.Table")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MatVecProject.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProject =
    copy(child = newChild)
}

object MatVecProject {
  /** Codegen reference object for the projection kernels. `bias` and
    * `scale` are NULLABLE BY CONTRACT — [[compute]] (and every other
    * consumer) must null-check them before use; [[MaxSimScore]] builds
    * bias-free tables, so a consumer that assumes non-null would NPE
    * on a perfectly valid table. */
  final case class Table(flat: Array[Double], rows: Int, dim: Int,
      bias: Array[Double], scale: Array[Double])
  object Table {
    def apply(m: Array[Array[Double]], bias: Array[Double],
        scale: Array[Double]): Table = {
      val dim = m(0).length
      val flat = new Array[Double](m.length * dim)
      var i = 0
      while (i < m.length) {
        require(m(i).length == dim, "graft: ragged projection matrix")
        System.arraycopy(m(i), 0, flat, i * dim, dim)
        i += 1
      }
      Table(flat, m.length, dim, bias, scale)
    }
  }

  def compute(a: ArrayData, t: Table): ArrayData = {
    val v = a.toFloatArray()
    VectorExpressions.dimCheck(v.length, t.dim)
    val out = new Array[Double](t.rows)
    var r = 0
    while (r < t.rows) {
      val off = r * t.dim
      var s = 0.0
      var j = 0
      while (j < t.dim) { s += t.flat(off + j) * v(j); j += 1 }
      if (t.bias != null) s -= t.bias(r)
      if (t.scale != null) s *= t.scale(r)
      out(r) = s
      r += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Squared L2 norm of an `array<double>` — the reduction half of the
  * projected-space distance `‖(M·v − b) − q_p‖²` once the affine
  * kernel has folded `q_p` into its bias: `SqNormD(MatVecProject(v,
  * M, b + q_p))` stays one codegen'd pipeline end-to-end (higher-order
  * `aggregate`/`zip_with` would fall out of whole-stage codegen). */
case class SqNormD(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_norm_d"

  override def nullSafeEval(v: Any): Any =
    SqNormD.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SqNormD.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SqNormD =
    copy(child = newChild)
}

object SqNormD {
  def compute(a: ArrayData): Double = {
    val v = a.toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }
}

/** Index of the nearest (squared-l2) centroid in a broadcast-style
  * centroid matrix riding the expression as a reference object — the
  * IVF coarse assignment without a per-row UDF. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends FloatVecUnaryExpression {
  require(centroids.nonEmpty, "graft: nearest_centroid needs centroids")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  // flattened once per executor: k rows of dim floats, cache-friendly
  @transient private lazy val table = NearestCentroid.Table(centroids)

  // plans print a stable marker, not a JVM array identity hash
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<centroids(${centroids.length})>")

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTable", table,
      "graft.functions.NearestCentroid.Table")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCentroid.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  final case class Table(flat: Array[Float], k: Int, dim: Int)
  object Table {
    def apply(cs: Array[Array[Float]]): Table = {
      val dim = cs(0).length
      val flat = new Array[Float](cs.length * dim)
      var i = 0
      while (i < cs.length) {
        require(cs(i).length == dim, "graft: ragged centroid matrix")
        System.arraycopy(cs(i), 0, flat, i * dim, dim)
        i += 1
      }
      Table(flat, cs.length, dim)
    }
  }

  def compute(a: ArrayData, t: Table): Int = {
    val v = a.toFloatArray()
    VectorExpressions.dimCheck(v.length, t.dim)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < t.k) {
      val off = c * t.dim
      var d = 0.0
      var j = 0
      while (j < t.dim) {
        val x = v(j).toDouble - t.flat(off + j)
        d += x * x
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** f32 → IEEE-half bits (array<smallint>) — `quantize_vector`'s f16
  * scalar kind, native. */
case class QuantizeF16Expr(child: Expression) extends FloatVecUnaryExpression {
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def prettyName: String = "quantize_f16"
  override def nullSafeEval(v: Any): Any =
    QuantExprs.qF16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantExprs.qF16($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeF16Expr =
    copy(child = newChild)
}

/** IEEE-half bits → f32 (exact). */
case class DequantizeF16Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dequantize_f16 expects array<smallint>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "dequantize_f16"
  override def nullSafeEval(v: Any): Any =
    QuantExprs.dqF16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantExprs.dqF16($c)")
  override protected def withNewChildInternal(newChild: Expression): DequantizeF16Expr =
    copy(child = newChild)
}

/** f32 → linear i8 codes over [lo, hi] (array<tinyint>). */
case class QuantizeI8Expr(child: Expression, lo: Float, hi: Float)
    extends FloatVecUnaryExpression {
  require(hi > lo, s"graft: invalid i8 range [$lo, $hi]")
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "quantize_i8"
  override def nullSafeEval(v: Any): Any =
    QuantExprs.qI8(v.asInstanceOf[ArrayData], lo, hi)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantExprs.qI8($c, ${lo}f, ${hi}f)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeI8Expr =
    copy(child = newChild)
}

/** i8 codes → f32 reconstruction levels. */
case class DequantizeI8Expr(child: Expression, lo: Float, hi: Float)
    extends UnaryExpression {
  require(hi > lo, s"graft: invalid i8 range [$lo, $hi]")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dequantize_i8 expects array<tinyint>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "dequantize_i8"
  override def nullSafeEval(v: Any): Any =
    QuantExprs.dqI8(v.asInstanceOf[ArrayData], lo, hi)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantExprs.dqI8($c, ${lo}f, ${hi}f)")
  override protected def withNewChildInternal(newChild: Expression): DequantizeI8Expr =
    copy(child = newChild)
}

/** f32 → the stored-scalar round-trip of a quant kind
  * ([[ScalarQuantizer.snap]]): what an hnsw artifact built with that
  * quant HOLDS for a given source vector. The validator's drift check
  * compares stored vectors against this, so quantized storage gets the
  * same content re-derivation as f32 (a drifted stored vector can no
  * longer hide behind "codes, not floats"). */
case class SnapQuantExpr(child: Expression, quant: String,
    lo: Float, hi: Float) extends FloatVecUnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "snap_quant"

  override def nullSafeEval(v: Any): Any =
    ScalarQuantizer.snapArray(v.asInstanceOf[ArrayData], quant, lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("snapQuant", quant, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.pq.ScalarQuantizer.snapArray($c, $q, ${lo}f, ${hi}f)")
  }

  override protected def withNewChildInternal(newChild: Expression): SnapQuantExpr =
    copy(child = newChild)
}

/** f32 → sign bits packed 32-per-int (array<int>, hamming layout). */
case class QuantizeB1Expr(child: Expression) extends FloatVecUnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quantize_b1"
  override def nullSafeEval(v: Any): Any =
    QuantExprs.qB1(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantExprs.qB1($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeB1Expr =
    copy(child = newChild)
}

/** b1-packed ints (32 bits, MSB-first) → exact 16-bit words as floats
  * (the hamming index's graph storage layout, `Metric.b1ToWords`) —
  * native form of the build-path conversion. */
case class B1ToWordsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"b1_to_words expects array<int>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "b1_to_words"
  override def nullSafeEval(v: Any): Any =
    QuantExprs.b1Words(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantExprs.b1Words($c)")
  override protected def withNewChildInternal(newChild: Expression): B1ToWordsExpr =
    copy(child = newChild)
}

/** Static kernels shared by eval and generated code. */
object QuantExprs {
  def qF16(a: ArrayData): ArrayData =
    ArrayData.toArrayData(ScalarQuantizer.quantizeF16(a.toFloatArray()))
  def dqF16(a: ArrayData): ArrayData =
    ArrayData.toArrayData(ScalarQuantizer.dequantizeF16(a.toShortArray()))
  def qI8(a: ArrayData, lo: Float, hi: Float): ArrayData =
    ArrayData.toArrayData(ScalarQuantizer.quantizeI8(a.toFloatArray(), lo, hi))
  def dqI8(a: ArrayData, lo: Float, hi: Float): ArrayData =
    ArrayData.toArrayData(ScalarQuantizer.dequantizeI8(a.toByteArray(), lo, hi))
  def qB1(a: ArrayData): ArrayData =
    ArrayData.toArrayData(ScalarQuantizer.quantizeB1(a.toFloatArray()))
  def b1Words(a: ArrayData): ArrayData =
    ArrayData.toArrayData(graft.ann.Metric.b1ToWords(a.toIntArray()))
}

/** Asymmetric-distance (ADC) PQ scan kernel as a codegen'd expression:
  * `dist = Σ_s lut[s][codes_s]` over a flat per-query LUT riding the
  * expression as a reference object (reference scan-time LUT,
  * lantern_hnsw/src/hnsw/pqtable.c:194-333). Replaces the per-row
  * Scala UDF in the PQ search hot path — a UDF pays catalyst→scala
  * ser/de per scanned code row and blocks whole-stage codegen, which
  * dominates once the probed-list scan grows with the corpus. */
case class PqAdcDistFixed(child: Expression, table: PqAdc.Flat)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dist expects array<smallint> codes, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dist"
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<lut(${table.flat.length / table.clusters}x${table.clusters})>")

  override def nullSafeEval(v: Any): Any =
    PqAdc.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcLut", table, "graft.functions.PqAdc.Flat")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqAdc.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcDistFixed =
    copy(child = newChild)
}

/** Keyed ADC: the LUT is selected per row by an integral key column —
  * `list_id` for the IVF-PQ probed-list scan (per-list residual LUTs)
  * or `query_id` for batched multi-query PQ scans. The LUT table rides
  * as one reference object (probed-lists × m × clusters doubles —
  * bounded by the probe budget, never the corpus). */
case class PqAdcDistKeyed(codes: Expression, key: Expression,
    table: PqAdc.Keyed) extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = key
  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, key.dataType) match {
    case (ArrayType(ShortType, _), IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (c, k) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dist_keyed expects (array<smallint>, int|bigint), got " +
        s"(${c.simpleString}, ${k.simpleString})")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dist_keyed"
  override def stringArgs: Iterator[Any] =
    Iterator(codes, key, s"<luts(${table.luts.size()} keys)>")

  override def nullSafeEval(c: Any, k: Any): Any = {
    val kk = k match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => other.asInstanceOf[Number].longValue()
    }
    PqAdc.computeKeyed(c.asInstanceOf[ArrayData], kk, table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcLuts", table, "graft.functions.PqAdc.Keyed")
    defineCodeGen(ctx, ev,
      (c, k) => s"graft.functions.PqAdc.computeKeyed($c, (long)$k, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDistKeyed =
    copy(codes = newLeft, key = newRight)
}

object PqAdc {
  /** One flat LUT: `flat(s * clusters + code)`. */
  final case class Flat(flat: Array[Double], clusters: Int)
  object Flat {
    def apply(lut: Array[Array[Double]]): Flat = {
      val clusters = lut(0).length
      val flat = new Array[Double](lut.length * clusters)
      var s = 0
      while (s < lut.length) {
        require(lut(s).length == clusters, "graft: ragged ADC LUT")
        System.arraycopy(lut(s), 0, flat, s * clusters, clusters)
        s += 1
      }
      Flat(flat, clusters)
    }
  }

  /** Keyed flat LUTs (java HashMap: fast lookup, java-serializable). */
  final case class Keyed(luts: java.util.HashMap[java.lang.Long, Flat])
  object Keyed {
    def apply(m: Iterable[(Long, Array[Array[Double]])]): Keyed = {
      val h = new java.util.HashMap[java.lang.Long, Flat]()
      m.foreach { case (k, lut) => h.put(k, Flat(lut)) }
      Keyed(h)
    }
  }

  def compute(a: ArrayData, t: Flat): Double = {
    val n = a.numElements()
    var s = 0
    var d = 0.0
    while (s < n) {
      d += t.flat(s * t.clusters + a.getShort(s))
      s += 1
    }
    d
  }

  def computeKeyed(a: ArrayData, key: Long, t: Keyed): Double = {
    val lut = t.luts.get(key)
    if (lut == null) throw new IllegalStateException(
      s"graft: ADC scan saw key $key with no LUT (probed-list/query set mismatch)")
    compute(a, lut)
  }
}

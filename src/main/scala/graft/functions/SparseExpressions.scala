package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Sparse-vector expressions for learned-sparse retrieval (SPLADE /
  * uniCOIL-style impact vectors, and pgvector's `sparsevec` shape:
  * https://github.com/pgvector/pgvector — `sparsevec` stores sorted
  * (index, value) pairs; the reference engine works over dense
  * `real[]`, this extends the same distance-expression family to the
  * sparse encoding).
  *
  * Physical encoding: `struct<indices: array<int>, values: array<float>>`
  * with strictly increasing indices — the canonical postings layout.
  * [[graft.ops.SparseSearch.sparsify]] produces it; anything else that
  * builds the struct must keep indices sorted (the merge below relies
  * on it, exactly as every inverted-index intersection does).
  *
  * The dot product is a two-pointer sorted merge, accumulating matched
  * products in ascending-index order in double — the same accumulation
  * order as a dense left-to-right sum over the shared coordinates, so
  * results are bit-identical to the SQL-oracle replay and to the
  * inverted-index path's term-ordered sum.
  */
object SparseExpressions {
  /** Sorted-merge dot product over two (indices, values) structs.
    * Called from both interpreted eval and generated code. */
  def dot(a: InternalRow, b: InternalRow): Double = {
    val ia = a.getArray(0); val va = a.getArray(1)
    val ib = b.getArray(0); val vb = b.getArray(1)
    if (ia == null || va == null || ib == null || vb == null) {
      // e.g. sparsify(NULL) — a non-null struct wrapping null arrays
      throw new IllegalArgumentException(
        "graft: sparse vector has null indices/values arrays " +
          "(was the dense input NULL?)")
    }
    val na = ia.numElements(); val nb = ib.numElements()
    if (na != va.numElements() || nb != vb.numElements()) {
      throw new IllegalArgumentException(
        s"graft: sparse vector indices/values length mismatch: " +
          s"$na/${va.numElements()} vs $nb/${vb.numElements()}")
    }
    var i = 0; var j = 0; var s = 0.0
    while (i < na && j < nb) {
      val x = ia.getInt(i); val y = ib.getInt(j)
      if (x == y) {
        s += va.getFloat(i).toDouble * vb.getFloat(j).toDouble
        i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    s
  }

  /** Field names are free; the (array<int>, array<float>) shape is fixed. */
  private[functions] def isSparseStruct(t: DataType): Boolean = t match {
    case StructType(Array(f0, f1)) =>
      (f0.dataType, f1.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) => true
        case _ => false
      }
    case _ => false
  }
}

/** Dot product of two sparse vectors (sorted-merge over shared
  * indices); returns double. NULL input → NULL. */
case class SparseDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (SparseExpressions.isSparseStruct(left.dataType) &&
        SparseExpressions.isSparseStruct(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two struct<array<int>, array<float>> " +
          s"arguments, got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SparseExpressions.dot(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SparseExpressions.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseDot =
    copy(left = newLeft, right = newRight)
}

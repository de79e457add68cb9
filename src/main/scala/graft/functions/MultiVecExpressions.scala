package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Late-interaction (multi-vector) MaxSim scoring kernel — the ColBERT
  * relevance model (Khattab & Zaharia, "ColBERT: Efficient and
  * Effective Passage Search via Contextualized Late Interaction over
  * BERT", SIGIR 2020): a document is an ARRAY of token vectors, the
  * query a small matrix of token vectors riding the expression as a
  * reference object, and the score is
  *
  *   score(D) = Σ_q max_{t ∈ D} ⟨Q_q, D_t⟩
  *
  * One codegen'd pass per document row — no per-row UDF, no explode of
  * the document's tokens. The per-token dot products use the SAME
  * sequential double accumulation as [[MatVecProject.compute]] (and a
  * SQL `list_sum(list_transform(list_zip(...)))` replay), `max` is
  * order-independent, and the final sum runs in ascending query-token
  * order — so the score is bit-identical to the flat
  * posexplode/groupBy formulation ([[graft.ops.MultiVec.scoreFlat]])
  * and to the DuckDB oracle.
  */
case class MaxSimScore(
    child: Expression,
    queryToks: Array[Array[Double]])
    extends UnaryExpression {
  require(queryToks.nonEmpty && queryToks.head.nonEmpty,
    "graft: maxsim_score needs a non-empty query token matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<array<float>>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "maxsim_score"

  @transient private lazy val table = MatVecProject.Table(queryToks, null, null)

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"<query(${queryToks.length}x${queryToks.head.length})>")

  override def nullSafeEval(v: Any): Any =
    MaxSimScore.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxsimQuery", table,
      "graft.functions.MatVecProject.Table")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MaxSimScore.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxSimScore =
    copy(child = newChild)
}

/** MaxSim with BOTH sides as expressions — the correlated form a
  * LATERAL subquery needs (`ORDER BY maxsim_score(toks, p.qtoks) DESC
  * LIMIT k`, where the query token matrix is an OUTER column, not a
  * plan-time literal): [[MaxSimScore]] carries its query as a
  * reference object and so cannot express a per-row query. Same score,
  * same accumulation order (sequential ascending-index double dot per
  * token pair, exact max, ascending query-token sum) — bit-identical
  * to [[MaxSimScore]] and the flat/oracle paths, because a float
  * widened to double multiplies exactly like the pre-widened matrix.
  * Registered in SQL as `maxsim_score`; the lateral planner rule
  * matches it and rewrites to the batched PLAID search. */
case class MaxSimScoreCol(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isTokMatrix(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isTokMatrix(left.dataType) && isTokMatrix(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<array<float>> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "maxsim_score"

  override def nullSafeEval(d: Any, q: Any): Any =
    MaxSimScore.computeCol(d.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, q) =>
      s"${ev.value} = graft.functions.MaxSimScore.computeCol($d, $q);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimScoreCol =
    copy(left = newLeft, right = newRight)
}

object MaxSimScore {

  /** Column-query MaxSim: score(D, Q) = Σ_q max_t ⟨Q_q, D_t⟩ with the
    * same fold orders as [[compute]]. */
  def computeCol(doc: ArrayData, q: ArrayData): Double = {
    val nq = q.numElements()
    require(nq > 0, "graft: maxsim_score with an empty query token matrix")
    val nd = doc.numElements()
    require(nd > 0, "graft: maxsim_score over an empty document token array")
    val qm = new Array[Array[Float]](nq)
    var r = 0
    while (r < nq) { qm(r) = q.getArray(r).toFloatArray(); r += 1 }
    val maxes = new Array[Double](nq)
    java.util.Arrays.fill(maxes, Double.NegativeInfinity)
    var ti = 0
    while (ti < nd) {
      val v = doc.getArray(ti).toFloatArray()
      r = 0
      while (r < nq) {
        val qr = qm(r)
        VectorExpressions.dimCheck(v.length, qr.length)
        var s = 0.0
        var j = 0
        while (j < qr.length) { s += qr(j).toDouble * v(j); j += 1 }
        if (s > maxes(r)) maxes(r) = s
        r += 1
      }
      ti += 1
    }
    var out = 0.0
    r = 0
    while (r < nq) { out += maxes(r); r += 1 }
    out
  }

  def compute(a: ArrayData, t: MatVecProject.Table): Double = {
    val n = a.numElements()
    require(n > 0, "graft: maxsim_score over an empty document token array")
    val maxes = new Array[Double](t.rows)
    java.util.Arrays.fill(maxes, Double.NegativeInfinity)
    var ti = 0
    while (ti < n) {
      val v = a.getArray(ti).toFloatArray()
      VectorExpressions.dimCheck(v.length, t.dim)
      var r = 0
      while (r < t.rows) {
        val off = r * t.dim
        var s = 0.0
        var j = 0
        while (j < t.dim) { s += t.flat(off + j) * v(j); j += 1 }
        if (s > maxes(r)) maxes(r) = s
        r += 1
      }
      ti += 1
    }
    // ascending query-token order — the same fold order as the flat
    // path's sorted-struct aggregate and the oracle's ordered list_sum
    var out = 0.0
    var r = 0
    while (r < t.rows) { out += maxes(r); r += 1 }
    out
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector distance expressions.
  *
  * Semantics follow the reference engine's distance operators
  * (lantern_hnsw/src/hnsw.c:354-376, sql/lantern.sql:32-45):
  *  - `l2sq_dist`  : SQUARED Euclidean distance (no sqrt), `<->`
  *  - `cos_dist`   : 1 - cosine similarity, `<=>`
  *  - `hamming_dist`: bit-level hamming over int arrays (each int is a
  *    packed 32-bit chunk; dim = 32 * len — lantern_hnsw/src/hnsw.c:308-319), `<+>`
  *  - dimension mismatch raises (lantern_hnsw/src/hnsw.c:296-331)
  *  - NULL input → NULL (null-intolerant, standard SQL)
  *
  * Implementation is Spark-native: each is a Catalyst `BinaryExpression`
  * with whole-stage-codegen support (`doGenCode`), accumulating in
  * double for deterministic, oracle-matchable results. Inputs are
  * `ArrayType(FloatType)` (the engine's canonical vector type — one
  * physical type covers both lantern `real[]` and pgvector `vector`).
  */
object VectorExpressions {
  @inline def dimCheck(n1: Int, n2: Int): Unit = {
    if (n1 != n2) {
      throw new IllegalArgumentException(
        s"graft: vector dimension mismatch: $n1 vs $n2")
    }
  }

  def checkBinaryArrayInput(
      name: String, elem: DataType,
      left: Expression, right: Expression): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(`elem`, _), ArrayType(`elem`, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name expects two array<${elem.simpleString}> arguments, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }
  }
}

abstract class FloatVectorBinaryExpression extends BinaryExpression
    with Serializable {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkBinaryArrayInput(prettyName, FloatType, left, right)
  override def nullIntolerant: Boolean = true

  protected def compute(a: ArrayData, b: ArrayData): Any

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
}

/** Squared Euclidean distance over float vectors; returns double. */
case class L2SqDist(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_dist"

  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    VectorExpressions.dimCheck(n, b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |graft.functions.VectorExpressions.dimCheck($n, $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDist =
    copy(left = newLeft, right = newRight)
}

/** 1 - cosine similarity; returns double. Zero-norm input → 1.0. */
case class CosDist(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cos_dist"

  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    VectorExpressions.dimCheck(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val den = ctx.freshName("den")
      s"""
         |final int $n = $a.numElements();
         |graft.functions.VectorExpressions.dimCheck($n, $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |final double $den = Math.sqrt($na) * Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 1.0 : 1.0 - $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosDist =
    copy(left = newLeft, right = newRight)
}

/** Dot product (inner product) over float vectors; returns double.
  * Not a lantern operator per se but the building block for cosine
  * similarity search and IVF; exposed for the similarity-search API. */
case class InnerProduct(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "inner_product"

  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    VectorExpressions.dimCheck(n, b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |graft.functions.VectorExpressions.dimCheck($n, $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InnerProduct =
    copy(left = newLeft, right = newRight)
}

/** Bit-level hamming distance over int arrays: each int is a packed
  * 32-bit chunk (lantern_hnsw/src/hnsw.c:308-319). Returns int. */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkBinaryArrayInput(prettyName, IntegerType, left, right)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    VectorExpressions.dimCheck(n, b.numElements())
    var s = 0
    var i = 0
    while (i < n) { s += Integer.bitCount(a.getInt(i) ^ b.getInt(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |graft.functions.VectorExpressions.dimCheck($n, $b.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += Integer.bitCount($a.getInt($i) ^ $b.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

/** Euclidean (L2) norm of a float vector; returns double. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_norm expects array<float>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override def nullSafeEval(av: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    Math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

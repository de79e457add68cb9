package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.text.PorterStemmer

/** Snowball-English stem of a single (lowercase) token.
  * Matches the reference's rust-stemmers English algorithm
  * (lantern_extras/src/stemmers.rs:95-152). Codegen calls the static
  * JVM method directly, staying inside whole-stage codegen.
  */
case class StemWord(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"stem expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "stem"

  override def nullSafeEval(v: Any): Any =
    PorterStemmer.stemUTF8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.PorterStemmer.stemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): StemWord =
    copy(child = newChild)
}

/** SQL-REPRODUCIBLE 31-bit polynomial string hash:
  * fold over code points of `h = (h * mult + cp) mod (2^31 - 1)`.
  *
  * Exists so hash-derived operators (simhash sketches, winnowing
  * fingerprints, doc fingerprints) have query variants an external
  * ANSI-SQL oracle can replay exactly — xxhash64 has no DuckDB analog.
  * DuckDB equivalent:
  * {{{
  * list_reduce(list_prepend(CAST(0 AS BIGINT),
  *   list_transform(range(1, len(t)+1), i -> ascii(t[i]))),
  *   (a, b) -> (a * M + b) % 2147483647)
  * }}}
  * (DuckDB `ascii` yields the code point, hence code points here, not
  * bytes.) NOT a quality hash — 31 bits, low avalanche; production
  * paths default to xxhash64 and only the oracle-checked variants use
  * this.
  */
case class PolyHash31(child: Expression, mult: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash31 expects string, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash31"

  override def nullSafeEval(v: Any): Any =
    PolyHash31.compute(v.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHash31.compute($c, $mult)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash31 =
    copy(child = newChild)
}

object PolyHash31 {
  def compute(s: UTF8String, mult: Int): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }
}

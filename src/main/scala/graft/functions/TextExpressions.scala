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

package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column DSL for the graft vector/text functions, mirroring
  * `org.apache.spark.sql.functions`. All functions are native Catalyst
  * expressions with whole-stage codegen — no Scala UDF overhead.
  */
package object functions {
  private def col(e: Expression): Column = GraftSqlShim.column(e)
  private def ex(c: Column): Expression = GraftSqlShim.expression(c)

  /** Squared Euclidean distance (lantern `<->`). */
  def l2sq_dist(a: Column, b: Column): Column = col(L2SqDist(ex(a), ex(b)))
  /** Cosine distance, 1 - cos similarity (lantern `<=>`). */
  def cos_dist(a: Column, b: Column): Column = col(CosDist(ex(a), ex(b)))
  /** Bit-level hamming distance over packed int arrays (lantern `<+>`). */
  def hamming_dist(a: Column, b: Column): Column = col(HammingDist(ex(a), ex(b)))
  /** Dot product. */
  def inner_product(a: Column, b: Column): Column = col(InnerProduct(ex(a), ex(b)))
  /** Euclidean norm. */
  def vector_norm(a: Column): Column = col(L2Norm(ex(a)))

  /** Register every graft function for SQL use (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("l2sq_dist", es => L2SqDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cos_dist", es => CosDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming_dist", es => HammingDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("inner_product", es => InnerProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_norm", es => L2Norm(es(0)), "built-in")
  }
}

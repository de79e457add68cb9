package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Spark internals needed by any library that
  * defines native Catalyst expressions on Spark 4.x (where `Column` no
  * longer wraps an `Expression` directly). Kept to the minimum surface.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Serializable Hadoop conf carrier for executor-side FileSystem access
    * (`org.apache.spark.util.SerializableConfiguration` is private[spark]). */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)
}

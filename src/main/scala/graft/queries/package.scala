package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One driver-checkable query: a Spark DataFrame program plus (when
    * SQL-expressible) an equivalent DuckDB oracle over the same parquet
    * tables. Results must be deterministically ordered and all float
    * columns rounded, so the driver's hash compare is stable.
    */
  case class QueryDef(
      name: String,
      oracle: Option[String],
      fn: (SparkSession, String) => DataFrame)
}

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

  /** Run `f` with `spark.sql.shuffle.partitions` pinned to `n`,
    * restoring the old value after. Stateful STREAMING gates use this:
    * the state-store fan-out is locked to the shuffle-partition count
    * at query start, and 32 state partitions × N microbatches of
    * delta-file commits dominate small-gate wall time (measured: the
    * windowed-quality gate dropped ~2× at 8). Batch queries are NOT
    * wrapped — the session default is sized for the data, and state
    * partitioning is a deliberately SMALLER knob only because gate
    * state is tiny. */
  private[queries] def withShufflePartitions[T](
      s: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, old)
  }
}

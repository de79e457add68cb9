package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.xxhash64

/** Deterministic, order-invariant sampling.
  *
  * `df.limit(n)` takes whichever partitions list first — at 100 TB
  * that is "whatever file sorted first", a skewed sample that biases
  * k-means codebooks/centroids toward one shard's distribution (the
  * reference samples randomly: lantern_cli/src/index_autotune/
  * mod.rs:188-218). Hash-ordering instead gives a pseudo-random sample
  * that is a pure function of the DATA (invariant to partition layout,
  * file order, and parallelism), reproducible across runs, and costs
  * one pass with per-partition top-n + driver merge
  * (TakeOrderedAndProject) — no count job, no full sort.
  */
object Sampling {

  /** Up to `n` rows of `df`, chosen as the global top-`n` by
    * xxhash64 of `keys` (use a stable id or the sampled value itself).
    */
  def hashSample(df: DataFrame, n: Int, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "graft: hashSample needs at least one key column")
    df.orderBy(xxhash64(keys: _*)).limit(n)
  }
}

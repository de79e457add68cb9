package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data EXPORT stage: turn a cleaned corpus into what a
  * trainer actually consumes — a global token stream cut into
  * fixed-size blocks (GPT-style concat-and-chunk packing), and a
  * deterministically shuffled, fixed-size sharding of the rows.
  *
  * Both need an EXACT global prefix over a total order, which is the
  * classic distributed-scan problem: a naive
  * `Window.orderBy(id)` (no partitionBy) collapses to ONE task holding
  * the whole corpus — the canonical Spark scale trap. [[runningTotal]]
  * implements the two-level scan instead: range-bucket the order key
  * (boundaries from one `approxQuantile` pass — the EXACTNESS of the
  * result never depends on where the boundaries fall, only the
  * balance), aggregate one total per bucket (rows = bucket count),
  * broadcast the exclusive bucket offsets back as a literal map, and
  * finish with a per-bucket window. Every stage is parallel in the
  * bucket count; driver state is O(buckets).
  */
object Packing {

  /** Exact inclusive running total of `valueCol` over the global order
    * `orderCols` (the head must be numeric, non-null, and is used for
    * range bucketing; the full list must be a total order for the
    * result to be deterministic). Adds `out` (long) and preserves all
    * input columns.
    */
  def runningTotal(
      df: DataFrame,
      valueCol: Column,
      orderCols: Seq[Column],
      out: String,
      buckets: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "graft: runningTotal needs an order key")
    val spark = df.sparkSession
    val nb =
      if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyed = df.withColumn("__rt_key", orderCols.head.cast("double"))
    // One pass for approximate bucket boundaries. Exactness does not
    // depend on them — only load balance does — so the loose epsilon
    // and the approx sketch are fine.
    val bounds =
      if (nb <= 1) Array.empty[Double]
      else keyed.stat
        .approxQuantile("__rt_key", (1 until nb).map(_.toDouble / nb).toArray, 0.001)
        .distinct.sorted
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else aggregate(
        lit(bounds), lit(0),
        (acc, b) => acc + when(col("__rt_key") >= b, 1).otherwise(0))
    val bucketed = keyed.withColumn("__rt_bucket", bucketCol)
    // Per-bucket totals: one tiny aggregate (≤ nb rows to the driver).
    val totals = bucketed
      .groupBy(col("__rt_bucket"))
      .agg(sum(valueCol.cast("long")).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val ids = 0 to bounds.length
    val offsets = ids.scanLeft(0L)((acc, b) => acc + totals.getOrElse(b, 0L))
    val offMap = map(ids.flatMap(b => Seq(lit(b), lit(offsets(b)))): _*)
    val w = Window.partitionBy(col("__rt_bucket")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn(out,
        element_at(offMap, col("__rt_bucket")) + sum(valueCol.cast("long")).over(w))
      .drop("__rt_key", "__rt_bucket")
  }

  /** Concat-and-chunk packing: documents, taken in `orderCols` order,
    * are conceptually concatenated into one token stream which is cut
    * into `blockSize`-token training blocks. Adds:
    *  - `start_token`  — the doc's offset in the global stream,
    *  - `first_block` / `last_block` — the blocks the doc lands in
    *    (a doc spanning a boundary continues in the next block, as in
    *    GPT-style pretraining pipelines).
    * Rows whose `tokensCol` is null or ≤ 0 must be filtered upstream —
    * they have no extent in the stream.
    */
  def assignBlocks(
      df: DataFrame,
      tokensCol: Column,
      blockSize: Int,
      orderCols: Seq[Column],
      buckets: Int = 0): DataFrame = {
    require(blockSize > 0, s"graft: blockSize must be positive, got $blockSize")
    val withEnd = runningTotal(df, tokensCol, orderCols, "__end_token", buckets)
    withEnd
      .withColumn("start_token", col("__end_token") - tokensCol.cast("long"))
      .withColumn("first_block", floor(col("start_token") / blockSize))
      .withColumn("last_block", floor((col("__end_token") - 1) / blockSize))
      .drop("__end_token")
  }

  /** Length-grouped batch assignment — padding-efficient batching for
    * LLM training/inference (dynamic batching à la fairseq/T5: batching
    * similar-length sequences bounds per-batch padding waste
    * n·max(len) − Σlen). Docs take the global (len DESC, id) order via
    * the SAME two-level scan as block packing ([[runningTotal]] of 1s
    * — no single-task global window), cut into `batchSize`-doc
    * batches. Adds `batch` (0-based) to every row. */
  def lengthBatches(
      df: DataFrame,
      idCol: String,
      lenCol: Column,
      batchSize: Int,
      buckets: Int = 0): DataFrame = {
    require(batchSize > 0, s"graft: batchSize must be positive, got $batchSize")
    runningTotal(
        df.withColumn("__neg_len", -lenCol.cast("long")),
        lit(1L), Seq(col("__neg_len"), col(idCol)), "__rank", buckets)
      .withColumn("batch", expr(s"(__rank - 1) div $batchSize"))
      .drop("__neg_len", "__rank")
  }

  /** Deterministic seeded global shuffle + fixed-size shard
    * assignment — the final "write the training set" step. Rows are
    * totally ordered by `(polyhash31(seed ":" id), id)` (a
    * reproducible permutation independent of cluster layout) and cut
    * into shards of `shardRows` rows. Adds `shard` and `pos` (position
    * within the shard). */
  def shuffledShards(
      df: DataFrame,
      idCol: String,
      shardRows: Int,
      seed: String,
      buckets: Int = 0): DataFrame = {
    require(shardRows > 0, s"graft: shardRows must be positive, got $shardRows")
    val h = Mixture.sampleHash(col(idCol), seed)
    val ranked = runningTotal(
      df.withColumn("__shuf", h), lit(1L),
      Seq(col("__shuf"), col(idCol)), "__rank", buckets)
    ranked
      .withColumn("shard", floor((col("__rank") - 1) / shardRows))
      .withColumn("pos", (col("__rank") - 1) % shardRows)
      .drop("__shuf", "__rank")
  }

  /** Write the shuffled sharding as parquet partitioned by shard dir
    * (`path/shard=N/`), each shard holding exactly `shardRows` rows
    * (last shard possibly short). One file per shard: the repartition
    * keys by shard so a 100 TB export streams shard-parallel. */
  def writeShards(
      df: DataFrame,
      idCol: String,
      shardRows: Int,
      seed: String,
      path: String,
      buckets: Int = 0): Unit =
    shuffledShards(df, idCol, shardRows, seed, buckets)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}

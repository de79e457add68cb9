package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextAnalysis

/** Stateful streaming operators for continuous ingestion — the
  * Structured Streaming side of the training-data pipeline: streams
  * get the SAME dedup/quality semantics as batch, with state held in
  * Spark's state store instead of a shuffle.
  */
object StreamingDedup {

  /** Streaming exact dedup: keyed by a 64-bit content fingerprint
    * (docFingerprint — whitespace/punct-robust), only the FIRST
    * document per fingerprint is emitted; later arrivals are dropped
    * via `flatMapGroupsWithState` per-key state. State is one boolean
    * per distinct fingerprint — the streaming analog of
    * `Dedup.exactDedup`. The fingerprint expression is pluggable so
    * the driver gate can run the SQL-replayable variant
    * ([[TextAnalysis.docFingerprintSql]]) against a DuckDB oracle.
    */
  def dropSeenDuplicates(
      stream: DataFrame,
      textCol: String,
      fingerprint: Column => Column = TextAnalysis.docFingerprint): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val schema = stream.schema
    val enc = RowEncoder.encoderFor(schema)
    val keyed = stream
      .withColumn("__fp", fingerprint(col(textCol)))
      .groupByKey(r => r.getAs[Long]("__fp"))(Encoders.scalaLong)

    val out: Dataset[Row] = keyed.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(
      (_: Long, rows: Iterator[Row], state: GroupState[Boolean]) => {
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          rows.take(1).map(r => Row.fromSeq(r.toSeq.dropRight(1)))
        }
      })(Encoders.scalaBoolean, enc)
    out
  }

  private object Encoders {
    val scalaLong: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    val scalaBoolean: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
  }

  /** Bounded-state streaming dedup via Spark's BUILT-IN
    * `dropDuplicatesWithinWatermark`: duplicates of a fingerprint are
    * dropped as long as they arrive within the watermark delay of the
    * first sighting, and state EXPIRES afterwards — the knob
    * [[dropSeenDuplicates]] deliberately lacks (its state never
    * expires; exact forever, unbounded). This is the production
    * trade-off for infinite streams: state is bounded by (fingerprints
    * seen per watermark window), and re-emission of a very-late
    * duplicate is accepted by contract. */
  def dropDuplicatesWithinDelay(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      delay: String,
      fingerprint: Column => Column = TextAnalysis.docFingerprint): DataFrame =
    stream
      .withColumn("__fp", fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Watermarked per-window corpus statistics (docs + mean quality per
    * event-time window): the `readStream → watermark → windowed agg`
    * shape for monitoring a live ingestion feed. Late data beyond the
    * watermark is dropped; state is bounded by (windows in flight ×
    * groups).
    */
  def qualityByWindow(
      stream: DataFrame,
      tsCol: String,
      textCol: String,
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    stream
      // quantize each score to 1e-4 BEFORE aggregating: the window
      // mean then reduces over exact integers, so the result cannot
      // drift with partial-aggregation order (floating-point addition
      // is not associative; a monitoring stream should not flap on
      // repartition)
      .withColumn("__q4",
        floor(TextAnalysis.qualityScore(col(textCol)) * 1e4 + 0.5).cast("long"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("n_docs"), sum(col("__q4")).as("__s4"))
      .select(col("window.start").as("window_start"),
        col("n_docs"),
        round(col("__s4").cast("double") / col("n_docs") / 1e4, 4)
          .as("avg_quality"))
}

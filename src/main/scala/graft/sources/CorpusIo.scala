package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus interchange I/O — JSONL and CSV ingest/export around the
  * parquet-native tables, the formats a training-data pipeline meets
  * at its edges (crawler output, annotation drops, vendor deliveries).
  *
  * Format guidance baked into the API:
  *   - JSONL for text corpora: embedded newlines/quotes are escaped
  *     inside one physical line per record, so files stay SPLITTABLE —
  *     a 100 TB drop fans out by input split with no special options.
  *   - CSV for flat numeric/metadata tables. CSV with embedded
  *     newlines needs `multiLine`, which makes each file one
  *     unsplittable task — that's why [[readCsv]] doesn't enable it
  *     and text corpora should go through JSONL instead.
  *   - Schemas are ALWAYS explicit. Inference reads the data an extra
  *     time (and samples), which at scale is both a second full scan
  *     and a correctness risk; every reader here requires the
  *     StructType.
  */
object CorpusIo {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** array<float> → "x0 x1 …" for CSV cells. Java's Float.toString is
    * shortest-round-trip, so [[textToVec]] recovers bit-identical
    * floats. */
  def vecToText(vec: Column): Column = concat_ws(" ", vec)

  def textToVec(s: Column): Column =
    split(s, " ").cast("array<float>")
}

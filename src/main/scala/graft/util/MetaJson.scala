package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny driver-written JSON metadata files riding inside index/table
  * artifacts (the sparse postings' bucket count, the multivec index's
  * toksPerDoc/dim, the mrl index's prefix dim). One shared
  * reader/writer so the three artifact families can't drift in IO or
  * field-extraction behavior — the payloads are single flat objects of
  * ints and strings, so a regex extractor is deliberately sufficient
  * (no parser dependency, no nesting). */
object MetaJson {

  /** Write `json` (one line) to `file`, overwriting. */
  def write(spark: SparkSession, file: String, json: String): Unit = {
    val p = new Path(file)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    try out.write((json + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The file's text, or None when it does not exist. */
  def read(spark: SparkSession, file: String): Option[String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Like [[read]] but a missing file is an error naming `what`. */
  def readRequired(spark: SparkSession, file: String, what: String): String =
    read(spark, file).getOrElse(throw new IllegalArgumentException(
      s"graft: $file does not exist — $what"))

  def intField(text: String, key: String, where: String): Int =
    s""""$key":(\\d+)""".r.findFirstMatchIn(text)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: $where is missing the $key field")).group(1).toInt

  def strField(text: String, key: String, where: String): String =
    s""""$key":"([^"]+)"""".r.findFirstMatchIn(text)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: $where is missing the $key field")).group(1)
}

package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CorpusIoSpec extends SparkTestBase {
  import spark.implicits._

  test("jsonl roundtrip preserves newlines, quotes, unicode, nulls") {
    val docs = Seq(
      (1L, "plain text"),
      (2L, "line one\nline two\n\ttabbed"),
      (3L, "quotes \" and \\ backslash and ümlaut 中文 😀"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("ciospec-j").toString
    CorpusIo.writeJsonl(docs, path)
    val back = CorpusIo.readJsonl(spark, path, docs.schema)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(back.toSeq == docs.orderBy("doc_id").as[(Long, String)].collect().toSeq)
  }

  test("csv roundtrip with quoted text and bit-exact float vectors") {
    val rows = Seq(
      (1L, "with, comma and \"quote\"", Array(0.1f, -2.5f, 3.4028235e38f)),
      (2L, "plain", Array(1e-45f, 0f, -0f)))
      .toDF("id", "note", "vec")
      .withColumn("cell", CorpusIo.vecToText(col("vec")))
      .drop("vec")
    val path = java.nio.file.Files.createTempDirectory("ciospec-c").toString
    CorpusIo.writeCsv(rows, path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, note STRING, cell STRING")
    val back = CorpusIo.readCsv(spark, path, schema)
      .withColumn("vec", CorpusIo.textToVec(col("cell")))
      .orderBy("id")
      .select("id", "note", "vec")
      .as[(Long, String, Array[Float])].collect()
    assert(back(0)._2 == "with, comma and \"quote\"")
    assert(back(0)._3.toSeq == Seq(0.1f, -2.5f, 3.4028235e38f))
    assert(back(1)._3.toSeq == Seq(1e-45f, 0f, -0f))
  }
}

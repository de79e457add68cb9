package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VecFiles

/** Driver-checkable query for the `.fvecs` reader (SURVEY.md §2.5,
  * parse_fvecs). A deterministic fixture file is written to the local
  * tmp dir, read back through the distributed reader, and compared to
  * a literal VALUES oracle.
  */
object SourceQueries {

  private val N = 20

  private def fixtureVec(i: Int): Array[Float] =
    Array(i.toFloat, i + 0.25f, 2f * i, -(i + 1).toFloat)

  private def parseFvecs(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), "graft-fixture.fvecs").toString
    VecFiles.writeFvecs(path, (0 until N).map(fixtureVec))
    VecFiles.readFvecs(s, path)
      .select(
        col("id"),
        element_at(col("vec"), 1).cast("double").as("v0"),
        element_at(col("vec"), 2).cast("double").as("v1"),
        element_at(col("vec"), 3).cast("double").as("v2"),
        element_at(col("vec"), 4).cast("double").as("v3"))
      .orderBy("id")
  }

  private val oracle: String = {
    val rows = (0 until N).map { i =>
      val v = fixtureVec(i)
      s"(CAST($i AS BIGINT), " + v.map(x => s"CAST($x AS DOUBLE)").mkString(", ") + ")"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(id, v0, v1, v2, v3) ORDER BY id"
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("parse_fvecs", Some(oracle), parseFvecs),
  )
}

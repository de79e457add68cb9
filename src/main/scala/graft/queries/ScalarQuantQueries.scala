package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pq.ScalarQuantizer

/** Driver-checkable query for scalar quantization (SURVEY.md §2.3,
  * quant_bits → i8). The i8 encode/decode formulas are tie-free
  * (floor(x+0.5)) so DuckDB reproduces them bit-for-bit; f16/b1 are
  * golden-tested in ScalarQuantSpec (IEEE bit tricks aren't SQL).
  */
object ScalarQuantQueries {

  private def quantI8(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val codes = ScalarQuantizer.quantize_i8(col("embedding"))
    val deq = ScalarQuantizer.dequantize_i8(codes)
    e.select(
        col("vec_id"),
        element_at(codes, 1).cast("int").as("c0"),
        element_at(codes, 2).cast("int").as("c1"),
        element_at(codes, 3).cast("int").as("c2"),
        round(element_at(deq, 1).cast("double"), 4).as("d0"))
      .orderBy("vec_id")
  }

  private val oracle: String = {
    def clamp(x: String) = s"LEAST(GREATEST(CAST($x AS DOUBLE), -1.0), 1.0)"
    def code(j: Int) =
      s"CAST(LEAST(GREATEST(floor((${clamp(s"embedding[${j + 1}]")} + 1.0) * 127.5 + 0.5) - 128, -128), 127) AS INT)"
    s"""SELECT vec_id,
       |${code(0)} AS c0, ${code(1)} AS c1, ${code(2)} AS c2,
       |round(-1.0 + (${code(0)} + 128) * 2.0 / 255.0, 4) AS d0
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("scalar_quant_i8", Some(oracle), quantI8),
  )
}

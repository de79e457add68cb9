package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Golden values from the reference's distance tests
  * (lantern_hnsw/test/sql/hnsw_dist_func.sql:1-37, hnsw_operators.sql).
  */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def f(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("l2sq_dist golden: {0,0,0} <-> {2,3,-4} = 29 (squared, no sqrt)") {
    val df = Seq((f(0, 0, 0), f(2, 3, -4))).toDF("a", "b")
    assert(df.select(l2sq_dist($"a", $"b")).as[Double].head() == 29.0)
  }

  test("cos_dist golden: [1,0,0] vs [0,.5,0] = 1.0 (orthogonal)") {
    val df = Seq((f(1, 0, 0), f(0, 0.5, 0))).toDF("a", "b")
    assert(df.select(cos_dist($"a", $"b")).as[Double].head() == 1.0)
  }

  test("cos_dist of identical vectors = 0") {
    val df = Seq((f(1, 2, 3), f(1, 2, 3))).toDF("a", "b")
    assert(math.abs(df.select(cos_dist($"a", $"b")).as[Double].head()) < 1e-12)
  }

  test("hamming_dist: ints are packed 32-bit chunks: {1,0,1} vs {0,1,0} = 3") {
    val df = Seq((Array(1, 0, 1), Array(0, 1, 0))).toDF("a", "b")
    assert(df.select(hamming_dist($"a", $"b")).as[Int].head() == 3)
  }

  test("hamming_dist counts bits, not elements: {3} vs {0} = 2") {
    val df = Seq((Array(3), Array(0))).toDF("a", "b")
    assert(df.select(hamming_dist($"a", $"b")).as[Int].head() == 2)
  }

  test("inner_product and vector_norm") {
    val df = Seq((f(1, 2, 3), f(4, 5, 6))).toDF("a", "b")
    assert(df.select(inner_product($"a", $"b")).as[Double].head() == 32.0)
    assert(df.select(vector_norm($"a")).as[Double].head() ==
      math.sqrt(14.0))
  }

  test("dimension mismatch raises") {
    val df = Seq((f(1, 2), f(1, 2, 3))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(l2sq_dist($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("null input → null") {
    val df = Seq((Option(f(1, 2)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(l2sq_dist($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("SQL registration works") {
    registerAll(spark)
    Seq((f(0, 0, 0), f(2, 3, -4))).toDF("a", "b")
      .createOrReplaceTempView("vt")
    assert(spark.sql("SELECT l2sq_dist(a, b) FROM vt").as[Double].head() == 29.0)
  }

  test("interpreted path matches codegen (fallback parity)") {
    // force interpreted eval via a config-off session clone
    val df = Seq((f(0.1, 0.2, 0.3), f(0.3, 0.2, 0.1))).toDF("a", "b")
    val cg = df.select(l2sq_dist($"a", $"b"), cos_dist($"a", $"b")).head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(l2sq_dist($"a", $"b"), cos_dist($"a", $"b")).head()
      assert(cg == interp)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}

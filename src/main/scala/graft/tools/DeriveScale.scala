package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared derivation of the scale-probe embeddings table: copy 0 is
  * the source verbatim, copies 1..N-1 shift ids by 2²⁴ and perturb
  * every element with seeded hash noise — deterministic, distinct,
  * same distribution, so index-build fingerprint caches hit across
  * probe reruns. Used by [[ScaleProbe]] and [[RetuneScaleProbe]]. */
object DeriveScale {
  /** Ensure `outDir/embeddings.parquet` holds the `copies`× derivation
    * of `srcDir`'s table (reusing an existing one when the row count
    * matches — the recipe is deterministic); returns its row count. */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
      copies: Int, partitions: Int): Long = {
    val e = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val want = e.count() * copies
    val existing = new java.io.File(s"$outDir/embeddings.parquet")
    val reuse = existing.exists() &&
      (try spark.read.parquet(existing.toString).count() == want
       catch { case _: Throwable => false })
    if (!reuse) {
      graft.util.Files.deleteRecursively(new java.io.File(outDir))
      new java.io.File(outDir).mkdirs()
      val idOffset = 1L << 24 // far above any source vec_id
      val replicas = (0 until copies).map { c =>
        if (c == 0) e
        else e
          .withColumn("vec_id", col("vec_id") + lit(c * idOffset))
          // seeded hash noise in [-0.05, 0.05) per element: distinct
          // vectors, same scale/distribution as the source
          .withColumn("embedding", expr(
            s"""transform(embedding, (x, j) ->
               |  CAST(x + (pmod(hash(vec_id, j, $c), 1000) / 1000.0 - 0.5)
               |       * 0.1 AS FLOAT))""".stripMargin))
      }
      replicas.reduce(_ unionAll _)
        .repartition(partitions)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    spark.read.parquet(s"$outDir/embeddings.parquet").count()
  }
}

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

  /** ADVERSARIAL derivation: copies 1..N-1 are NOVEL points sampled
    * from a mixture around the k-means centers of the SOURCE corpus
    * (per-cluster spread matched to the cluster's own mean
    * center-distance), not jittered replicas of source rows. The
    * ±0.05-jitter recipe above makes recall geometrically EASIER as
    * copies grow — every query gains near-duplicate neighbors its
    * index finds trivially; mixture novel points instead densify the
    * query's own region with points that are NOT derived from it, so
    * the top-k boundary tightens and a fixed candidate budget starves
    * honestly. Deterministic (seeded k-means, hash-chosen cluster and
    * hash noise per element), so artifact fingerprint caches hit
    * across reruns. */
  def ensureAdversarial(spark: SparkSession, srcDir: String,
      outDir: String, copies: Int, partitions: Int,
      clusters: Int = 32): Long = {
    import spark.implicits._
    val e = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val want = e.count() * copies
    val existing = new java.io.File(s"$outDir/embeddings.parquet")
    val reuse = existing.exists() &&
      (try spark.read.parquet(existing.toString).count() == want
       catch { case _: Throwable => false })
    if (!reuse) {
      graft.util.Files.deleteRecursively(new java.io.File(outDir))
      new java.io.File(outDir).mkdirs()
      // seeded centers + per-cluster spread, derived from a bounded
      // sample (driver math over <=16384 × dim floats, like every
      // kmeans in the repo)
      val sample = graft.util.Sampling
        .hashSample(e.select(col("embedding")), 16384, col("embedding"))
        .collect().map(_.getSeq[Float](0).toArray)
      val centers = graft.pq.ProductQuantizer.kmeansLocalPublic(
        sample, clusters, maxIter = 20, tol = 1e-4, seed = 42L)
      def d2(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      val assignIdx = sample.map(p =>
        centers.indices.minBy(j => d2(p, centers(j))))
      val spread = centers.indices.map { j =>
        val ds = sample.zip(assignIdx).collect {
          case (p, a) if a == j => math.sqrt(d2(p, centers(j)))
        }
        if (ds.isEmpty) 0.05 else ds.sum / ds.length
      }
      val centersDf = broadcast(
        centers.zipWithIndex.map { case (c, j) =>
          (j, c.toSeq, spread(j)) }.toSeq
          .toDF("__cl", "__center", "__spread"))
      val idOffset = 1L << 24
      val novel = (1 until copies).map { c =>
        e.select((col("vec_id") + lit(c * idOffset)).as("vec_id"))
          .withColumn("__cl",
            pmod(hash(col("vec_id"), lit(c)), lit(clusters)))
          .join(centersDf, Seq("__cl"))
          // center + uniform noise scaled to the cluster's own spread
          // (per-element, seeded by (vec_id, element, copy))
          .withColumn("embedding", expr(
            s"""transform(__center, (x, j) ->
               |  CAST(x + (pmod(hash(vec_id, j, $c), 1000) / 1000.0 - 0.5)
               |       * 2.0 * __spread / sqrt(size(__center)) AS FLOAT))"""
              .stripMargin))
          .select(col("vec_id"), col("embedding"))
      }
      (e.select(col("vec_id"), col("embedding")) +: novel)
        .reduce(_ unionAll _)
        .repartition(partitions)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    spark.read.parquet(s"$outDir/embeddings.parquet").count()
  }
}

package graft.pq

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A trained product-quantization codebook:
  * `centroids(subvector)(centroidId)` = sub-centroid vector.
  *
  * Storage shape matches the reference's codebook table
  * `(subvector_id, centroid_id, c real[])` (lantern_hnsw/sql/
  * lantern.sql:229-233); codes are 0..255 so a quantized vector is
  * `array<smallint>` (the `pqvec` analog, SURVEY.md §1.1).
  */
case class PqCodebook(dim: Int, centroids: Array[Array[Array[Float]]]) {
  def subvectors: Int = centroids.length
  def clusters: Int = centroids(0).length
  def subDim: Int = dim / subvectors
  require(dim % subvectors == 0,
    s"graft: dim $dim not divisible by subvectors $subvectors")

  /** Nearest-centroid code per subvector slice (ties → lowest id). */
  def quantize(v: Array[Float]): Array[Short] = {
    require(v.length == dim, s"graft: vector dimension mismatch: ${v.length} vs $dim")
    val codes = new Array[Short](subvectors)
    var s = 0
    while (s < subvectors) {
      val off = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < clusters) {
        val cen = centroids(s)(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = v(off + j).toDouble - cen(j).toDouble
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best.toShort
      s += 1
    }
    codes
  }

  /** Concatenate the coded centroids back into a full vector. */
  def dequantize(codes: Array[Short]): Array[Float] = {
    require(codes.length == subvectors,
      s"graft: pqvec length ${codes.length} != subvectors $subvectors")
    val out = new Array[Float](dim)
    var s = 0
    while (s < subvectors) {
      System.arraycopy(centroids(s)(codes(s).toInt), 0, out, s * subDim, subDim)
      s += 1
    }
    out
  }

  /** Asymmetric-distance lookup table for one query: `lut(s)(c)` =
    * l2sq(query slice s, centroid c). Distance to any coded vector is
    * then Σ_s lut(s)(code_s) — one table scan over 1-byte-per-subvector
    * codes instead of full floats (reference scan-time LUT,
    * lantern_hnsw/src/hnsw/pqtable.c:194-333).
    */
  def l2sqLut(q: Array[Float]): Array[Array[Double]] = {
    require(q.length == dim, s"graft: vector dimension mismatch: ${q.length} vs $dim")
    Array.tabulate(subvectors) { s =>
      val off = s * subDim
      Array.tabulate(clusters) { c =>
        val cen = centroids(s)(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = q(off + j).toDouble - cen(j).toDouble
          d += x * x
          j += 1
        }
        d
      }
    }
  }

  def toDf(spark: SparkSession): DataFrame = {
    val rows = for {
      s <- centroids.indices
      c <- centroids(s).indices
    } yield Row(s, c, centroids(s)(c).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("subvector_id", IntegerType),
        StructField("centroid_id", IntegerType),
        StructField("centroid", ArrayType(FloatType)))))
  }
}

object PqCodebook {
  def fromDf(df: DataFrame, dim: Int): PqCodebook = {
    val rows = df.select("subvector_id", "centroid_id", "centroid").collect()
    val bySub = rows.groupBy(_.getInt(0))
    val centroids = (0 until bySub.size).toArray.map { s =>
      bySub(s).sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
    }
    PqCodebook(dim, centroids)
  }
}

/** Product quantization — codebook training, column quantize/dequantize,
  * and PQ-aware (asymmetric LUT) search. SURVEY.md §2.3.
  *
  * Training is the Spark-native shape of the reference's subvector-
  * parallel k-means job (`lantern-cli pq-table`, lantern_cli/src/pq/
  * codebook.rs:19-68: linfa KMeans tol=0.1, max 20 iters, one run per
  * subvector — the reference even fans subvectors out to GCP Batch
  * tasks; here each subvector is one MLlib KMeans fit over a sampled
  * slice). Sampling bounds driver/ML cost at 100 TB: codebook quality
  * needs ~1000·clusters rows, not the full table (`limit` param of
  * `create_pq_codebook`, sql/lantern.sql:60).
  */
object ProductQuantizer {

  /** Train per-subvector k-means over (a sample of) the vector column —
    * `create_pq_codebook` (lantern_hnsw/src/hnsw/pqtable.c:40-190).
    */
  def trainCodebook(
      df: DataFrame,
      vecCol: String,
      clusters: Int = 256,
      subvectors: Int = 8,
      sampleLimit: Int = 100000,
      seed: Long = 42L): PqCodebook = {
    require(clusters >= 1 && clusters <= 256,
      s"graft: clusters=$clusters out of range [1,256] (codes are one byte)")
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % subvectors == 0,
      s"graft: dim $dim not divisible by subvectors $subvectors")
    val subDim = dim / subvectors
    val sample = df.select(col(vecCol).as("v")).limit(sampleLimit).cache()
    try {
      val centroids = (0 until subvectors).toArray.map { s =>
        val slices = sample.select(
          array_to_vector(
            slice(col("v"), s * subDim + 1, subDim).cast(ArrayType(DoubleType)))
            .as("features"))
        val model = new KMeans()
          .setK(clusters).setMaxIter(20).setTol(0.1).setSeed(seed + s)
          .fit(slices)
        model.clusterCenters.map(_.toArray.map(_.toFloat))
      }
      PqCodebook(dim, centroids)
    } finally { sample.unpersist(); () }
  }

  /** `quantize_vector` as a column (sql/lantern.sql:256-307). The
    * codebook rides the closure — broadcast once per task, tiny.
    */
  def quantizeUdf(cb: PqCodebook): UserDefinedFunction =
    udf { v: Seq[Float] => cb.quantize(v.toArray).toSeq }

  /** `dequantize_vector` as a column (sql/lantern.sql:310-339). */
  def dequantizeUdf(cb: PqCodebook): UserDefinedFunction =
    udf { codes: Seq[Short] => cb.dequantize(codes.toArray).toSeq }

  /** `quantize_table`: materialize `<col>_pq` next to the source column
    * (sql/lantern.sql:342-429 — the GENERATED-column analog; keeping it
    * in sync is the ingestion pipeline's job).
    */
  def quantizeTable(df: DataFrame, vecCol: String, cb: PqCodebook): DataFrame =
    df.withColumn(s"${vecCol}_pq", quantizeUdf(cb)(col(vecCol)))

  /** `drop_quantization` (sql/lantern.sql:431-452). */
  def dropQuantization(df: DataFrame, vecCol: String): DataFrame =
    df.drop(s"${vecCol}_pq")

  /** PQ-aware top-k: asymmetric distance via per-query LUT, then the
    * standard TakeOrderedAndProject merge. Scans only the code column
    * (subvectors bytes/row vs 4·dim) — the 100 TB path when the full
    * float column is too hot.
    */
  def searchPq(
      df: DataFrame,
      idCol: String,
      pqCol: String,
      cb: PqCodebook,
      query: Array[Float],
      k: Int): DataFrame = {
    val lut = cb.l2sqLut(query)
    val distUdf = udf { codes: Seq[Short] =>
      var s = 0; var d = 0.0
      while (s < codes.length) { d += lut(s)(codes(s).toInt); s += 1 }
      d
    }
    df.select(col(idCol), distUdf(col(pqCol)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}

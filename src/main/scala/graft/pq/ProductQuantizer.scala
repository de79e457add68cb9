package graft.pq

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
    *
    * One Spark job collects the bounded sample; the per-subvector fits
    * run as LOCAL seeded Lloyd's iterations in parallel threads — the
    * same shape as the reference CLI (linfa k-means over a sampled
    * cursor, rayon-parallel per subvector, pq/codebook.rs:19-68:
    * tol=0.1, max 20 iters, one run). Codebook quality needs
    * ~1000·clusters rows, not the corpus, so the collect is bounded by
    * `sampleLimit` regardless of table size; 32 driver-side fits beat
    * 32 sequential MLlib jobs by the per-job overhead × 32.
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
    val sample = graft.util.Sampling
      .hashSample(df.select(col(vecCol).as("v")), sampleLimit, col("v"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "graft: empty training sample for PQ codebook")

    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fits = (0 until subvectors).map { s =>
      Future {
        val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
        kmeansLocal(pts, clusters, maxIter = 20, tol = 0.1, seed = seed + s)
      }
    }
    PqCodebook(dim, Await.result(Future.sequence(fits), Duration.Inf).toArray)
  }

  /** Seeded local k-means for other components (IVF coarse centroids). */
  private[graft] def kmeansLocalPublic(
      points: Array[Array[Float]], k: Int, maxIter: Int, tol: Double,
      seed: Long): Array[Array[Float]] =
    kmeansLocal(points, k, maxIter, tol, seed)

  /** Seeded Lloyd's with k-means++ init (tol/iters per the reference's
    * linfa config). Returns exactly `k` centroids (duplicates when the
    * sample has fewer distinct points).
    */
  private[pq] def kmeansLocal(
      points: Array[Array[Float]], k: Int, maxIter: Int, tol: Double,
      seed: Long): Array[Array[Float]] = {
    val d = points(0).length
    val rnd = new java.util.Random(seed)
    @inline def dist2(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < d) { val x = a(j) - b(j); s += x * x; j += 1 }
      s
    }
    // k-means++ seeding
    val centers = Array.ofDim[Double](k, d)
    val first = points(rnd.nextInt(points.length))
    var j = 0
    while (j < d) { centers(0)(j) = first(j); j += 1 }
    val minD = points.map(p => dist2(p, centers(0)))
    var c = 1
    while (c < k) {
      val total = minD.sum
      var pick = 0
      if (total <= 0) pick = rnd.nextInt(points.length)
      else {
        var r = rnd.nextDouble() * total
        var i = 0
        while (i < points.length - 1 && r > minD(i)) { r -= minD(i); i += 1 }
        pick = i
      }
      j = 0
      while (j < d) { centers(c)(j) = points(pick)(j); j += 1 }
      var i = 0
      while (i < points.length) {
        val dd = dist2(points(i), centers(c))
        if (dd < minD(i)) minD(i) = dd
        i += 1
      }
      c += 1
    }
    // Lloyd iterations
    val assign = new Array[Int](points.length)
    val sums = Array.ofDim[Double](k, d)
    val counts = new Array[Int](k)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      java.util.Arrays.fill(counts, 0)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      var i = 0
      while (i < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var cc = 0
        while (cc < k) {
          val dd = dist2(points(i), centers(cc))
          if (dd < bestD) { bestD = dd; best = cc }
          cc += 1
        }
        assign(i) = best
        counts(best) += 1
        j = 0
        while (j < d) { sums(best)(j) += points(i)(j); j += 1 }
        i += 1
      }
      moved = 0.0
      var cc = 0
      while (cc < k) {
        if (counts(cc) > 0) {
          j = 0
          while (j < d) {
            val nv = sums(cc)(j) / counts(cc)
            val dj = nv - centers(cc)(j)
            moved += dj * dj
            centers(cc)(j) = nv
            j += 1
          }
        } else {
          // empty cluster: reseed at a random point
          val p = points(rnd.nextInt(points.length))
          j = 0
          while (j < d) { centers(cc)(j) = p(j); j += 1 }
        }
        cc += 1
      }
      moved = math.sqrt(moved)
      iter += 1
    }
    centers.map(_.map(_.toFloat))
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

  /** PQ-aware top-k: asymmetric distance via per-query LUT over the
    * code column (subvectors bytes/row vs 4·dim — the 100 TB path when
    * the full float column is too hot), then an EXACT re-rank: the LUT
    * pre-selects `max(ef, 4k)` candidates and the true float column is
    * fetched for just those ids (broadcast join-back — the same
    * heap-fetch form the ANN planner rule uses) to compute exact top-k.
    * Without the re-rank, PQ top-k recall decays as the corpus grows
    * (quantization error ties swap ranks) — the reference's asymmetric
    * search likewise feeds a re-check. Pass `rerankCol = None` to get
    * raw LUT-distance top-k (e.g. when the float column is unavailable).
    */
  def searchPq(
      df: DataFrame,
      idCol: String,
      pqCol: String,
      cb: PqCodebook,
      query: Array[Float],
      k: Int,
      rerankCol: Option[String] = None,
      ef: Int = 64): DataFrame = {
    // ADC as a codegen'd expression (PqAdcDistFixed) — the full-table
    // code scan is the hot path and must stay in whole-stage codegen
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val lutFlat = graft.functions.PqAdc.Flat(cb.l2sqLut(query))
    def adcDist(codes: Column) =
      GraftSqlShim.column(graft.functions.PqAdcDistFixed(
        GraftSqlShim.expression(codes), lutFlat))
    rerankCol match {
      case None =>
        df.select(col(idCol), adcDist(col(pqCol)).as("dist"))
          .orderBy(col("dist"), col(idCol))
          .limit(k)
      case Some(vc) =>
        val nCand = math.max(ef, 4 * k)
        val cands = df.select(col(idCol), adcDist(col(pqCol)).as("lut_dist"))
          .orderBy(col("lut_dist"), col(idCol))
          .limit(nCand)
          .select(col(idCol))
        df.select(col(idCol), col(vc))
          .join(broadcast(cands), Seq(idCol))
          .select(col(idCol),
            graft.functions.l2sq_dist(col(vc), lit(query)).as("dist"))
          .orderBy(col("dist"), col(idCol))
          .limit(k)
    }
  }

  /** Batched multi-query asymmetric PQ search — output-compatible with
    * [[graft.ann.AnnIndex.searchMany]] (query_id, neighbor_id, dist,
    * rank ≤ k). ONE pass over the code table: the tiny query-id set
    * cross-joins in (broadcast), every row is scored against its
    * query's LUT by the codegen'd keyed ADC kernel, and the per-query
    * top-k is a rank window — which Spark 4 plans as a partial
    * WindowGroupLimit, so each task pre-prunes to k before the single
    * shuffle (no N×Q rows ever move). With `rerankCol` the per-query
    * LUT top-`max(ef, 4k)` pool joins back to the true float column
    * and the exact metric ranks the final k. */
  def searchPqMany(
      df: DataFrame,
      idCol: String,
      pqCol: String,
      cb: PqCodebook,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      rerankCol: Option[String] = None,
      ef: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val spark = df.sparkSession
    import spark.implicits._
    val luts = graft.functions.PqAdc.Keyed(
      queries.map { case (qid, q) => (qid, cb.l2sqLut(q)) })
    def adcDist(codes: Column, qid: Column) =
      GraftSqlShim.column(graft.functions.PqAdcDistKeyed(
        GraftSqlShim.expression(codes), GraftSqlShim.expression(qid), luts))
    val qIds = queries.map(_._1).toDF("query_id")
    val scored = df
      .select(col(idCol).cast("long").as("neighbor_id"), col(pqCol))
      .crossJoin(broadcast(qIds))
      .select(col("query_id"), col("neighbor_id"),
        adcDist(col(pqCol), col("query_id")).as("lut_dist"))
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("lut_dist"), col("neighbor_id"))
    rerankCol match {
      case None =>
        scored.withColumn("rank", row_number().over(wl))
          .where(col("rank") <= k)
          .select(col("query_id"), col("neighbor_id"),
            col("lut_dist").as("dist"), col("rank"))
      case Some(vc) =>
        val nCand = math.max(ef, 4 * k)
        val cands = scored.withColumn("__r", row_number().over(wl))
          .where(col("__r") <= nCand)
          .select(col("query_id"), col("neighbor_id"))
        val qVecs = queries.map { case (qid, q) => (qid, q.toSeq) }
          .toDF("query_id", "__qv")
        val we = Window.partitionBy(col("query_id"))
          .orderBy(col("dist"), col("neighbor_id"))
        df.select(col(idCol).cast("long").as("neighbor_id"), col(vc).as("__v"))
          .join(broadcast(cands), Seq("neighbor_id"))
          .join(broadcast(qVecs), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            graft.functions.l2sq_dist(col("__v"), col("__qv")).as("dist"))
          .withColumn("rank", row_number().over(we))
          .where(col("rank") <= k)
    }
  }
}

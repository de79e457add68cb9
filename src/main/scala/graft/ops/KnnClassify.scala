package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN majority-vote classification over an embedding column — the
  * "model-based quality filter" stage of a training-data pipeline
  * (label a 100 TB corpus from a small curated seed set, the same
  * shape as fastText-style quality classifiers applied in published
  * pipelines such as CCNet / FineWeb-Edu, but with the corpus's own
  * embeddings instead of a trained model).
  *
  * Seed sets are small by construction (they are hand-curated), so the
  * scale path broadcasts them and scores MAP-SIDE with a bounded
  * insertion top-k per row — one corpus pass, zero shuffle, O(|seeds|·k)
  * work per row. If the seed set exceeds the broadcast byte budget the
  * operator falls back to the exact cross-join + rank-window form
  * (correct but |data|·|seeds| shuffle); past that regime, build an
  * ANN index over the seeds and use [[graft.ann.AnnIndex.searchMany]].
  *
  * Determinism: the k-neighbor set is ordered by `(dist, seed_id)` and
  * votes tie-break to the SMALLEST label — no RNG, no partition-order
  * dependence, SQL-replayable.
  */
object KnnClassify {

  /** One scored row: predicted label, its vote count among the k
    * nearest seeds, and the nearest seed id (diagnostics / audits). */
  final case class Prediction(id: Long, label: Int, votes: Int, nn_id: Long)

  private type Dist = (Array[Float], Array[Float]) => Double

  /** Same double-accumulation order as [[graft.functions.CosDist]] so
    * map-side scores match the SQL-expression path bit-for-bit. */
  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"graft: vector dim mismatch ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }

  private def l2sqDist(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"graft: vector dim mismatch ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  private def distFn(metric: String): Dist = metric match {
    case "cos" => cosDist
    case "l2sq" => l2sqDist
    case other => throw new IllegalArgumentException(
      s"graft: unknown classify metric '$other' (expected cos|l2sq)")
  }

  /** Classify every row of `data` by majority vote among its k nearest
    * seeds. `data` needs (idCol: long, vecCol: array<float>); `seeds`
    * needs (seedIdCol: long, seedVecCol: array<float>, labelCol: int).
    * Returns (id, label, votes, nn_id) — one row per data row.
    */
  def classify(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: DataFrame,
      seedIdCol: String,
      seedVecCol: String,
      labelCol: String,
      k: Int,
      metric: String = "cos"): DataFrame = {
    require(k > 0, s"graft: k must be positive, got $k")
    val spark = data.sparkSession
    val seedRows = seeds
      .select(
        col(seedIdCol).cast("long"),
        col(seedVecCol).cast("array<float>"),
        col(labelCol).cast("int"))
      .collectAsList()
    require(!seedRows.isEmpty, "graft: classify needs a non-empty seed set")
    val seedArr = new Array[(Long, Array[Float], Int)](seedRows.size())
    var i = 0
    var bytes = 0L
    while (i < seedRows.size()) {
      val r = seedRows.get(i)
      val vec = r.getSeq[Float](1).toArray
      seedArr(i) = (r.getLong(0), vec, r.getInt(2))
      bytes += 4L * vec.length + 32L
      i += 1
    }
    val budget = graft.GraftConf.classifyBroadcastBytes(spark)
    if (bytes > budget)
      // The seed set outgrew the broadcast budget before this collect
      // in any sane deployment — callers with huge seed sets should
      // pre-count and route to classifyViaJoin/ANN. Fail loudly rather
      // than silently ship a multi-GB broadcast.
      throw new IllegalArgumentException(
        s"graft: seed set ~$bytes bytes exceeds " +
          s"${graft.GraftConf.ClassifyBroadcastBytes}=$budget; " +
          "use classifyViaJoin or an ANN index over the seeds")
    classifyBroadcast(spark, data, idCol, vecCol, seedArr, k, distFn(metric))
  }

  private def classifyBroadcast(
      spark: SparkSession,
      data: DataFrame,
      idCol: String,
      vecCol: String,
      seedArr: Array[(Long, Array[Float], Int)],
      k: Int,
      dist: Dist): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(seedArr)
    val kk = k
    data
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val seeds = bc.value
        val n = math.min(kk, seeds.length)
        rows.map { case (id, vec) =>
          // bounded insertion top-n by (dist, seed_id)
          val ds = new Array[Double](n)
          val ids = new Array[Long](n)
          val labs = new Array[Int](n)
          var filled = 0
          var s = 0
          while (s < seeds.length) {
            val (sid, svec, slab) = seeds(s)
            val d = dist(vec, svec)
            if (filled < n || d < ds(filled - 1) ||
                (d == ds(filled - 1) && sid < ids(filled - 1))) {
              var j = math.min(filled, n - 1)
              while (j > 0 && (ds(j - 1) > d ||
                  (ds(j - 1) == d && ids(j - 1) > sid))) {
                ds(j) = ds(j - 1); ids(j) = ids(j - 1); labs(j) = labs(j - 1)
                j -= 1
              }
              ds(j) = d; ids(j) = sid; labs(j) = slab
              if (filled < n) filled += 1
            }
            s += 1
          }
          // majority vote, ties to the smallest label
          var bestLab = Int.MaxValue; var bestCnt = 0
          var a = 0
          while (a < filled) {
            var cnt = 0
            var b = 0
            while (b < filled) {
              if (labs(b) == labs(a)) cnt += 1
              b += 1
            }
            if (cnt > bestCnt || (cnt == bestCnt && labs(a) < bestLab)) {
              bestCnt = cnt; bestLab = labs(a)
            }
            a += 1
          }
          Prediction(id, bestLab, bestCnt, ids(0))
        }
      }
      .toDF()
  }

  /** The no-broadcast exact form: cross join + per-row rank window +
    * vote aggregation. |data|·|seeds| shuffle — for seed sets past the
    * broadcast budget but small enough that exactness still matters
    * more than the shuffle. Identical output to [[classify]]. */
  def classifyViaJoin(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: DataFrame,
      seedIdCol: String,
      seedVecCol: String,
      labelCol: String,
      k: Int,
      metric: String = "cos"): DataFrame = {
    val d = data.select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
    val sd = seeds.select(
      col(seedIdCol).cast("long").as("__sid"),
      col(seedVecCol).as("__sv"),
      col(labelCol).cast("int").as("__lab"))
    val rankW = Window.partitionBy(col("id"))
      .orderBy(col("__d"), col("__sid"))
    val topk = d.crossJoin(sd)
      .withColumn("__d", VectorSearch.distance(metric, col("__v"), col("__sv")))
      .withColumn("__rk", row_number().over(rankW))
      .where(col("__rk") <= k)
    val votes = topk.groupBy(col("id"), col("__lab"))
      .agg(count(lit(1)).cast("int").as("votes"),
        min(col("__rk")).as("__first"))
    val pickW = Window.partitionBy(col("id"))
      .orderBy(col("votes").desc, col("__lab"))
    val nn = topk.where(col("__rk") === 1)
      .select(col("id"), col("__sid").as("nn_id"))
    votes
      .withColumn("__pick", row_number().over(pickW))
      .where(col("__pick") === 1)
      .select(col("id"), col("__lab").as("label"), col("votes"))
      .join(nn, "id")
      .select("id", "label", "votes", "nn_id")
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{polyhash31, tokenize}

/** Hashed TF-IDF document vectors and the sparse cosine similarity
  * join over them — similarity search with NO embedding model in the
  * loop (the classic inverted-index form: Bayardo et al., "Scaling Up
  * All Pairs Similarity Search", WWW 2007). Tokens hash into a
  * `dim`-bounded bucket space ([[graft.functions.PolyHash31]], so the
  * whole pipeline replays in ANSI SQL); weights are `tf · idf` with
  * smooth idf `ln((N+1)/(df+1)) + 1`, L2-normalized per doc.
  *
  * Scale shape: weights are one explode + one (doc, bucket) aggregate
  * + two broadcast-sized joins (df table ≤ dim rows). The similarity
  * join NEVER materializes dense vectors — docs meet only through
  * shared buckets (shuffle keyed by bucket), and `maxDfRatio` drops
  * hub buckets (stopword mass) the way every production all-pairs
  * pipeline does, bounding each bucket's fan-out.
  */
object TfIdf {

  /** Sparse normalized weights: `(idCol, bucket, weight)` — weight =
    * tf·idf / ‖doc‖₂. Null-text and token-free docs produce no rows. */
  def hashedWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 4096): DataFrame = {
    require(dim >= 2, s"graft: tf-idf dim must be ≥2, got $dim")
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), explode(tokenize(col(textCol))).as("__tok"))
      .select(col(idCol), (polyhash31(col("__tok")) % dim).cast("int").as("bucket"))
    val tf = toks.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val n = tf.select(idCol).distinct().count()
    val df = tf.groupBy("bucket").agg(count(lit(1)).as("df"))
    val w = tf
      .join(broadcast(df), "bucket")
      .withColumn("w",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
    val norm = Window.partitionBy(col(idCol))
    w
      .withColumn("weight", col("w") / sqrt(sum(col("w") * col("w")).over(norm)))
      .select(col(idCol), col("bucket"), col("weight"))
  }

  /** Sparse cosine similarity join: `(id_a, id_b, sim)` for pairs
    * sharing ≥1 live bucket with sim ≥ `minSim`; `id_a < id_b`.
    * Buckets present in more than `maxDfRatio` of docs are dropped
    * from the join (hub pruning) — documented approximation, applied
    * identically in the SQL oracle. */
  def similarityJoin(
      weights: DataFrame,
      idCol: String,
      minSim: Double,
      maxDfRatio: Double = 0.5): DataFrame = {
    val n = weights.select(idCol).distinct().count()
    val live = weights
      .groupBy("bucket").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDfRatio * n)
      .select("bucket")
    val pruned = weights.join(broadcast(live), "bucket")
    val a = pruned.select(col(idCol).as("id_a"), col("bucket"),
      col("weight").as("wa"))
    val b = pruned.select(col(idCol).as("id_b"), col("bucket"),
      col("weight").as("wb"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("wa") * col("wb")).as("sim"))
      .where(col("sim") >= minSim)
  }
}

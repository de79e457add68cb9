package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.polyhash31

/** Contrastive training-pair mining over an embedding column — the
  * step that turns a deduped corpus into (anchor, positive, negative)
  * triplets for embedder fine-tuning (SimCSE/E5-style).
  *
  * Positives are the LSH-bucketed cosine near-dup pairs
  * ([[Dedup.embeddingNearDupPairs]] — never all-pairs). Negatives are
  * DETERMINISTIC hash probes into the id space: for each anchor, up to
  * `probes` candidate ids are generated from a seeded polynomial hash,
  * kept only if they exist in the corpus (semi join — id domains need
  * not be dense), are not the anchor/positive themselves, and are not
  * in the anchor's near-dup neighborhood (anti join against the pair
  * list, both orientations — so a "negative" can never be an
  * accidental positive at the mining threshold); the surviving probe
  * with the smallest probe index wins. Everything is hash-joins and
  * one explode — reproducible on any cluster layout, SQL-replayable,
  * no RNG state.
  */
object ContrastiveMining {

  def mineTriplets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      maxCosDist: Double,
      probes: Int = 10,
      seed: String = "neg"): DataFrame = {
    require(probes > 0, s"graft: probes must be positive, got $probes")
    val pairs = Dedup
      .embeddingNearDupPairs(df, idCol, vecCol, blockCol, maxCosDist)
    val n = df.count()
    val cands = pairs
      .select(col("id_a"), col("id_b"), col("dist"))
      .withColumn("k", explode(sequence(lit(0), lit(probes - 1))))
      .withColumn("cand",
        pmod(
          polyhash31(concat(lit(s"$seed:"), col("id_a").cast("string")))
            + col("k") * lit(2654435761L),
          lit(n)))
    val ids = df.select(col(idCol).cast("long").as("cand"))
    val nbrs = pairs.select(col("id_a"), col("id_b").as("cand"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("cand")))
    cands
      .join(ids, Seq("cand"), "left_semi")
      .where(col("cand") =!= col("id_a") && col("cand") =!= col("id_b"))
      .join(nbrs, Seq("id_a", "cand"), "left_anti")
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        min_by(col("cand"), col("k")).as("neg_id"),
        // dist is constant within a pair group; min is the
        // deterministic way to say "the" value
        min(col("dist")).as("dist"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.ann.AnnParams

/** The engine's configuration surface — `spark.graft.*` keys, the
  * analog of the reference's GUCs (`lantern_extras.bm25_default_k1/
  * bm25_default_b/bm25_default_approximation_threshhold`,
  * lantern_extras/src/lib.rs:29-46; `lantern_hnsw.init_k/ef` and index
  * reloption defaults, lantern_hnsw/src/hnsw/options.c:324-391,
  * options.h:14-25). All reads fall back to the reference defaults.
  */
object GraftConf {

  val Bm25K1 = "spark.graft.bm25.k1"
  val Bm25B = "spark.graft.bm25.b"
  val Bm25ApproxThreshold = "spark.graft.bm25.approxThreshold"
  val AnnM = "spark.graft.ann.m"
  val AnnEfConstruction = "spark.graft.ann.efConstruction"
  val AnnEf = "spark.graft.ann.ef"
  val AnnInitK = "spark.graft.ann.initK"

  // non-numeric values raise a CONFIG error naming the key — a bare
  // NumberFormatException from inside an optimizer rule would surface
  // as an opaque planning failure (the reference's GUC layer likewise
  // validates at SET time)
  private def dbl(s: SparkSession, key: String, dflt: Double): Double =
    s.conf.getOption(key).map { v =>
      v.toDoubleOption.getOrElse(throw new IllegalArgumentException(
        s"graft: $key must be a number, got '$v'"))
    }.getOrElse(dflt)
  private def int(s: SparkSession, key: String, dflt: Int): Int =
    s.conf.getOption(key).map { v =>
      v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"graft: $key must be an integer, got '$v'"))
    }.getOrElse(dflt)

  /** Runtime search-width override reaching the planner rewrites
    * (`lantern_hnsw.ef` analog); 0 = unset → per-index metadata. */
  def annEf(s: SparkSession): Int = int(s, AnnEf, 0)

  def bm25K1(s: SparkSession): Double = dbl(s, Bm25K1, 1.2)
  def bm25B(s: SparkSession): Double = dbl(s, Bm25B, 0.75)
  def bm25ApproxThreshold(s: SparkSession): Int =
    int(s, Bm25ApproxThreshold, 8000)

  val DedupBroadcastBytes = "spark.graft.dedup.broadcastBytes"

  /** Size budget below which dedup candidate verification broadcasts
    * the whole token-hash table and verifies map-side (zero shuffle) —
    * the same adaptive idea as Spark's broadcast-join threshold. Above
    * it, the blocked chunk-verify path runs (the 100 TB shape). */
  def dedupBroadcastBytes(s: SparkSession): Long =
    s.conf.getOption(DedupBroadcastBytes).map(_.toLong).getOrElse(128L << 20)

  val LmMaxDriverGrams = "spark.graft.lm.maxDriverGrams"
  val LmBroadcast = "spark.graft.lm.broadcast"

  /** Largest fitted char-LM table (unique gram keys, all orders) the
    * trigram scorer may collect + broadcast for the single-pass regime;
    * larger charsets fall back to the declarative join path. */
  def lmMaxDriverGrams(s: SparkSession): Long =
    s.conf.getOption(LmMaxDriverGrams).map(_.toLong).getOrElse(2000000L)

  /** Whether the join-path LM count tables take a broadcast hint
    * (disable for very large charsets so AQE picks the join). */
  def lmBroadcast(s: SparkSession): Boolean =
    s.conf.getOption(LmBroadcast).forall(_.toBoolean)

  val DedupAllPairsBucketLimit = "spark.graft.dedup.allPairsBucketLimit"

  /** Largest merged LSH bucket the keepers path may verify ALL-PAIRS,
    * even in the broadcast regime. The broadcast-regime gate is token-
    * table BYTES, which does not bound bucket SIZE: ~1M near-identical
    * short docs fit a 128 MB token budget yet form one merged bucket
    * whose all-pairs candidate set is ~5·10¹¹ rows. Buckets above this
    * limit route through the linear star-edge path regardless of
    * regime. 20,000 members caps per-bucket candidates at 2·10⁸ —
    * minutes of map-side codegen'd verification, no shuffle. */
  def dedupAllPairsBucketLimit(s: SparkSession): Int =
    int(s, DedupAllPairsBucketLimit, 20000)

  /** init_k: how many results an ANN search fetches when no explicit k
    * is given (GUC `lantern_hnsw.init_k`, default 10, max 1000). */
  def annInitK(s: SparkSession): Int = math.min(int(s, AnnInitK, 10), 1000)

  val AnnNprobe = "spark.graft.ann.nprobe"

  /** Runtime coarse-probe override for the ivf/ivfpq PLANNER paths —
    * the nprobe counterpart of the runtime `ef` GUC (`SET
    * spark.graft.ann.nprobe`); 0/unset keeps each registration's own
    * value. */
  def annNprobe(s: SparkSession): Int = int(s, AnnNprobe, 0)

  val AnnConsolidateShards = "spark.graft.ann.consolidateShards"

  /** Shard-count threshold past which an append-heavy index is
    * compacted (HTTP insert route): each append builds delta shards,
    * and search fans out one task per shard — row-at-a-time inserters
    * would otherwise grow shard count (and search latency) linearly
    * with the number of PUT batches. */
  def annConsolidateShards(s: SparkSession): Int =
    math.max(1, int(s, AnnConsolidateShards, 32))

  /** ANN build/search params seeded from the session conf. */
  def annParams(s: SparkSession): AnnParams = AnnParams(
    m = int(s, AnnM, 16),
    efConstruction = int(s, AnnEfConstruction, 128),
    ef = int(s, AnnEf, 64))

  val KnnJoinBroadcastBytes = "spark.graft.knnJoin.broadcastBytes"

  /** Largest outer-side query-vector payload the planner-level lateral
    * kNN join will collect + broadcast to the index shards (the probe
    * side of a kNN join is small by contract — classifier batches,
    * dashboard panels). Larger probe sides must call
    * `AnnIndex.searchMany` / `VectorSearch.knnJoin*` explicitly, which
    * keep both sides distributed. */
  def knnJoinBroadcastBytes(s: SparkSession): Long =
    s.conf.getOption(KnnJoinBroadcastBytes).map(_.toLong).getOrElse(256L << 20)

  val ClassifyBroadcastBytes = "spark.graft.classify.broadcastBytes"

  /** Largest seed set the kNN classifier will broadcast for map-side
    * scoring (same adaptive idea as [[dedupBroadcastBytes]]); bigger
    * seed sets must route through classifyViaJoin or an ANN index. */
  def classifyBroadcastBytes(s: SparkSession): Long =
    s.conf.getOption(ClassifyBroadcastBytes).map(_.toLong).getOrElse(256L << 20)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multi-query recall protocol — the Spark-side port of the reference's
  * regression recall measurement (`calculate_table_recall`,
  * lantern_hnsw/test/sql/utils/calculate_recall.sql:1-48, run with 100
  * query vectors at hnsw_pq.sql:83-86): a deterministic held-out query
  * set, the exact per-query top-k over the remaining base computed in
  * ONE broadcast window join, and the gate on the MEAN recall@k of the
  * batched ANN answers. A single-query recall check can pass a mediocre
  * graph by luck (or flake on a good one); averaging over ≥50 queries
  * is what makes the gate statistical evidence of graph quality.
  *
  * Recall is micro-averaged (integer hits / integer total) so a true
  * boundary value like 40/50 can never land at 0.7999… in double
  * arithmetic.
  */
object RecallProtocol {

  /** recall@K — the reference protocol's k. */
  val K = 10

  /** Held-out query count (reference uses 100 on 1k-row fixtures; 50
    * keeps the base ≥ 90% of the table at the sf0.01 gate scale). */
  val QueryCount = 50

  /** A deterministic split of a vector table into a held-out query set
    * and the base the index is built over. */
  final case class Holdout(
      base: DataFrame,
      queriesDf: DataFrame, // (query_id: long, qv) — for the exact window join
      queries: Array[(Long, Array[Float])]) // driver copy — for searchMany

  /** The `n` smallest ids form the query set, everything above them the
    * base — the same fixture shape as the reference's separate
    * `sift_query1k` table, derived deterministically from one table. */
  def holdout(e: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", n: Int = QueryCount): Holdout = {
    val rows = e.orderBy(col(idCol)).limit(n)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val maxQ = rows.map(_._1).max
    Holdout(
      base = e.where(col(idCol) > maxQ),
      queriesDf = e.where(col(idCol) <= maxQ)
        .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv")),
      queries = rows)
  }

  /** Exact per-query top-k ground truth over `base` — one broadcast
    * window join (queries are the tiny side), never a per-query loop. */
  def truth(queriesDf: DataFrame, base: DataFrame, idCol: String,
      vecCol: String, k: Int = K, metric: String = "l2sq"): Map[Long, Set[Long]] =
    perQuery(graft.ops.VectorSearch.knnJoinExact(
        queriesDf, "query_id", "qv", base, idCol, vecCol, k, metric)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))))

  def perQuery(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  def perQueryDf(df: DataFrame): Map[Long, Set[Long]] =
    perQuery(df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))))

  /** Mean recall@k ≥ `bar` with every query answered. */
  def meanRecallOk(ann: Map[Long, Set[Long]], exact: Map[Long, Set[Long]],
      bar: Double = 0.8): Boolean =
    ann.keySet == exact.keySet && {
      val hits = exact.iterator.map { case (qid, ex) =>
        ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size
      }.sum
      val total = exact.valuesIterator.map(_.size).sum
      hits.toDouble >= bar * total
    }

  /** Micro-averaged recall as a number (diagnostics / asymmetric bars). */
  def meanRecall(ann: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val hits = exact.iterator.map { case (qid, ex) =>
      ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size
    }.sum
    val total = exact.valuesIterator.map(_.size).sum
    if (total == 0) 0.0 else hits.toDouble / total
  }

  /** Run independent per-query probes CONCURRENTLY on a bounded pool —
    * the multi-query planner gates each optimize + execute one small
    * search per sample vector, and those round-trips are only
    * sequential because the driver calls them sequentially (guide
    * §2.6): submitting them together overlaps the driver-side Catalyst
    * work of one probe with the cluster work of another, so gate wall
    * ≈ one probe, not sampleCount. Order-preserving (results line up
    * with `xs`), pool bounded at 8 like [[graft.ann.Retune]]'s
    * probeAll; a probe's own exception rethrows unwrapped. */
  def probed[A, B](xs: Seq[A], slots: Int = 8)(f: A => B): Seq[B] =
    if (xs.sizeIs <= 1) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(xs.size, slots))
      try xs.map(x => pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = f(x)
        }))
        .map(fu => try fu.get()
        catch {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        })
      finally pool.shutdown()
    }

  /** Start `f` on its own thread NOW and hand back the join — overlaps
    * an independent distributed pass (typically the exact truth, which
    * never depends on the index artifact) with the build/stream chain
    * running on the caller's thread (guide §2.6: actions are only
    * sequential because the driver calls them sequentially). The
    * thunk's own exception rethrows unwrapped at the join.
    *
    * Runs on a fresh daemon thread, NOT ForkJoinPool.commonPool: a
    * blocking Spark collect would occupy a common-pool worker (shared
    * JVM-wide, sized ncpu-1) and silently serialize against other
    * common-pool users. One thread per call is fine at this fan-out —
    * gates start 1-2 overlapped passes, never hundreds.
    *
    * Fail-fast gate branches must STILL drain the thunk before
    * returning (discarding the value): an unjoined truth job would keep
    * running after the gate returns and bleed cluster work into the
    * next gate's bench timing. */
  def async[A](f: => A): () => A = {
    val fut = java.util.concurrent.CompletableFuture.supplyAsync(
      () => f,
      (r: Runnable) => {
        val t = new Thread(r, "graft-async")
        t.setDaemon(true)
        t.start()
      })
    () =>
      try fut.join()
      catch {
        case e: java.util.concurrent.CompletionException => throw e.getCause
      }
  }

  /** Per-(query, neighbor) exact distances for a batched ANN result —
    * used to assert reranked distances equal TRUE metric distances
    * (`ivfpq_recall_gate`'s distsTrue contract) without a per-query
    * loop: join the result pairs back to the base vectors and the query
    * vectors, recompute, compare. */
  def distsTrue(annDf: DataFrame, queriesDf: DataFrame, base: DataFrame,
      idCol: String, vecCol: String, metric: String = "l2sq",
      tol: Double = 1e-9): Boolean = {
    val b = base.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("__nv"))
    val r = annDf.select(col("query_id"), col("neighbor_id"), col("dist"))
      .join(b, Seq("neighbor_id"))
      .join(broadcast(queriesDf), Seq("query_id"))
      .select((abs(col("dist") -
        graft.ops.VectorSearch.distance(metric, col("__nv"), col("qv"))) <= tol)
        .as("ok"))
      .agg(min(col("ok"))).head()
    // min over ZERO rows is NULL — an empty ANN result (broken/empty
    // artifact) must fail the contract, not NPE
    !r.isNullAt(0) && r.getBoolean(0)
  }
}

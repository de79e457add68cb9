package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.sparse_dot

/** Learned-sparse retrieval (SPLADE / uniCOIL-style impact vectors;
  * the sparse analog of the engine's dense kNN surface, and the
  * `sparsevec` capability of the pgvector family the reference engine
  * belongs to).
  *
  * Representation: `struct<indices: array<int>, values: array<float>>`
  * with strictly increasing indices and non-negative impact weights —
  * the canonical postings layout ([[sparsify]] produces it from a
  * dense activation vector by ReLU-thresholding, the standard SPLADE
  * sparsification: Formal et al., "SPLADE: Sparse Lexical and
  * Expansion Model for First Stage Ranking", SIGIR 2021).
  *
  * Two physical search paths with IDENTICAL results:
  *
  *  - [[topK]] — one codegen'd [[graft.functions.SparseDot]] per row,
  *    `TakeOrderedAndProject` reduction: per-partition top-k heaps,
  *    k·P-row driver merge, no shuffle. The right shape when the
  *    sparse column is already materialized row-wise.
  *  - [[postings]] + [[invertedTopK]] — the inverted-index form: the
  *    corpus explodes ONCE into a (term, doc, weight) postings table
  *    (at scale: written out partitioned/bucketed BY TERM, so a query
  *    prunes to its own terms' partitions and reads nothing else);
  *    search is a broadcast join of the tiny query-term table against
  *    the postings, a per-doc sum, and a top-k. Matched postings per
  *    doc are bounded by the QUERY's nnz, so the per-group state is
  *    O(|q|) regardless of corpus size.
  *
  * Determinism contract: both paths accumulate matched products in
  * ascending-index order in double (the merge in `SparseDot`; a
  * sorted-struct fold in [[invertedTopK]]), so their scores are
  * bit-identical to each other and to a SQL replay — the same
  * oracle-matchability contract as the dense distance expressions.
  */
object SparseSearch {

  /** Sparse struct column from a dense vector: keep coordinates with
    * activation ≥ `tau` (ReLU threshold — non-negative impacts only),
    * indices ascending. Pure built-ins, stays in whole-stage codegen. */
  def sparsify(vec: Column, tau: Float): Column = {
    val pairs = filter(
      transform(vec, (x, i) => struct(i.cast("int").as("i"), x.as("x"))),
      p => p.getField("x") >= lit(tau))
    struct(
      transform(pairs, p => p.getField("i")).as("indices"),
      transform(pairs, p => p.getField("x")).as("values"))
  }

  /** Sparse query struct literal from driver-side arrays (indices must
    * be strictly increasing). */
  def queryLit(qIdx: Seq[Int], qVal: Seq[Float]): Column = {
    require(qIdx.length == qVal.length,
      s"graft: sparse query indices/values length mismatch: " +
        s"${qIdx.length} vs ${qVal.length}")
    require(qIdx.isEmpty || qIdx.zip(qIdx.tail).forall { case (a, b) => a < b },
      "graft: sparse query indices must be strictly increasing")
    struct(typedlit(qIdx).as("indices"), typedlit(qVal).as("values"))
  }

  /** Exact top-k by sparse dot product (descending; zero-overlap docs
    * score 0 and are excluded). One map-side expression per row +
    * `TakeOrderedAndProject` — no shuffle, no UDF. */
  def topK(
      docs: DataFrame,
      idCol: String,
      sv: Column,
      query: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"graft: sparse topK needs k >= 1, got $k")
    docs
      .select(col(idCol), sparse_dot(sv, query).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Explode a sparse column into the postings form
    * `(term: int, <idCol>, w: float)`. At scale, write this out
    * `partitionBy("term")` (or bucketed by term) once; queries then
    * touch only their own terms' files. */
  def postings(docs: DataFrame, idCol: String, sv: Column): DataFrame =
    docs
      .select(col(idCol), sv.getField("indices").as("__ti"),
        sv.getField("values").as("__tv"))
      .select(col(idCol), posexplode(col("__ti")).as(Seq("__p", "term")),
        col("__tv"))
      .select(col("term"), col(idCol),
        element_at(col("__tv"), col("__p") + 1).as("w"))

  /** Materialize the postings table PARTITIONED BY TERM — the
    * inverted-index layout on disk. A query then prunes the listing to
    * its own terms' directories ([[readPostings]]) and reads nothing
    * else: search I/O is proportional to the query's terms' posting
    * lists, not the corpus (the on-disk analog of an impact-sorted
    * inverted file; partition count = live vocabulary size). */
  def writePostings(post: DataFrame, path: String): Unit =
    post.write.partitionBy("term").mode("overwrite").parquet(path)

  /** Append new documents' postings to an existing [[writePostings]]
    * table (the `aminsert` analog for the inverted file): new files
    * land inside the term directories; scoring folds per-doc postings
    * in TERM order, so results are file-order-independent and
    * bit-identical to a from-scratch build over the union. */
  def appendPostings(post: DataFrame, path: String): Unit =
    post.write.partitionBy("term").mode("append").parquet(path)

  /** Partition-pruned read of a [[writePostings]] table: the `isin`
    * predicate on the partition column prunes at FILE-LISTING time
    * (`PartitionFilters` in the scan), so only the query's terms'
    * directories are touched. */
  def readPostings(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      qIdx: Seq[Int]): DataFrame = {
    require(qIdx.nonEmpty, "graft: readPostings needs at least one query term")
    spark.read.parquet(path).where(col("term").isin(qIdx: _*))
  }

  /** Inverted-index top-k: broadcast the query's (term, weight) rows
    * against the postings, sum per doc, cut top-k. The per-doc fold
    * runs over the matched postings sorted by term — ascending-index
    * order, so scores are bit-identical to [[topK]]'s merge (collected
    * state per doc is ≤ the query's nnz, driver-independent). */
  def invertedTopK(
      post: DataFrame,
      idCol: String,
      qIdx: Seq[Int],
      qVal: Seq[Float],
      k: Int): DataFrame = {
    require(k >= 1, s"graft: sparse invertedTopK needs k >= 1, got $k")
    require(qIdx.length == qVal.length,
      s"graft: sparse query indices/values length mismatch: " +
        s"${qIdx.length} vs ${qVal.length}")
    val s = post.sparkSession
    import s.implicits._
    val q = qIdx.zip(qVal).toDF("term", "qw")
    post
      .join(broadcast(q), "term")
      .select(col(idCol),
        struct(col("term"),
          (col("w").cast("double") * col("qw").cast("double")).as("prod"))
          .as("tp"))
      .groupBy(col(idCol))
      .agg(aggregate(sort_array(collect_list(col("tp"))), lit(0.0),
        (acc, x) => acc + x.getField("prod")).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

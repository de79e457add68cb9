package graft.text

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** BM25 full-text ranking as native DataFrame pipelines.
  *
  * Mirrors the reference's capability surface
  * (lantern_extras/src/bm25_api.sql, bm25_agg.rs) Spark-first:
  *  - `createBm25Table`: inverted index via explode → groupBy — one
  *    shuffle on term, map-side partial aggregation, no driver state.
  *  - `searchBm25`: postings of the (few) query terms explode →
  *    groupBy(doc_id).agg(sum(score)) → top-k. The shuffle is bounded
  *    by Σ posting-list sizes of the query terms, not the corpus.
  *  - High-frequency terms (> `bloomThreshold` docs) are approximated
  *    exactly as the reference does (bm25_agg.rs:162-188): fq:=min(fq,1),
  *    doc_len:=avgdl, candidates limited by a bloom filter — so at
  *    100 TB a stopword-ish term costs O(1) per candidate doc instead
  *    of exploding a billion-row posting list.
  *
  * Scoring formula (bm25_agg.rs:124-159):
  *   idf  = ln((N - df + 0.5) / (df + 0.5) + 1)       [always >= 0]
  *   bm25 = idf * fq*(k1+1) / (fq + k1*(1 - b + b*len/avgdl))
  * with defaults k1=1.2, b=0.75, bloomThreshold=8000
  * (lantern_extras/src/lib.rs:44-46).
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75
  val DefaultBloomThreshold = 8000

  /** Serialize a BloomFilter over long ids to bytes. */
  private[graft] def bloomBytes(ids: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val bf = BloomFilter.create(math.max(ids.size, 1).toLong, fpp)
    ids.foreach(bf.putLong)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Content-keyed per-executor cache of deserialized bloom filters.
    * `elem_in_bloom` and the bm25 bonus path probe the same handful of
    * filters across millions of rows; without this every probe would
    * re-parse a potentially multi-MB sketch. Key hashing is one pass
    * over the bytes — ~10× cheaper than readFrom and allocation-free
    * on hit. Bounded by per-entry LRU eviction (access-ordered
    * LinkedHashMap, the GraphCache pattern) — the earlier clear-on-128
    * dropped the WHOLE cache at once, a thundering-herd reparse under
    * concurrent searches with many distinct filters.
    */
  private final class BloomKey(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: BloomKey => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }
  private[graft] val BloomCacheMaxEntries = 128
  private val bloomCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[BloomKey, BloomFilter](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[BloomKey, BloomFilter]): Boolean =
          size() > BloomCacheMaxEntries
      })

  private[graft] def bloomCacheSize: Int = bloomCache.size()

  private[graft] def parsedBloom(bytes: Array[Byte]): BloomFilter = {
    val key = new BloomKey(bytes)
    var bf = bloomCache.get(key)
    if (bf == null) {
      bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      bloomCache.put(key, bf)
    }
    bf
  }

  private[graft] def bloomContains(bytes: Array[Byte], id: Long): Boolean =
    parsedBloom(bytes).mightContainLong(id)

  /** Build the inverted-index table from pre-analyzed documents.
    *
    * Input: `docs` with a long/int id column and an array<string> terms
    * column. Output schema (bm25_api.sql:33-52, plus an exact
    * `avg_doc_len` double alongside the reference's ×100 int encoding):
    *   term, term_freq (=#docs containing term), doc_ids, fqs, doc_lens,
    *   doc_ids_bloom (non-null only when term_freq > bloomThreshold),
    *   plus ONE stats row with term=NULL, term_freq=corpus size,
    *   doc_ids_len=avg_doc_len*100, avg_doc_len=exact avg.
    *
    * Skew safety at 100 TB: a stopword-ish term can appear in billions
    * of docs, and `collect_list` of its full posting list would be a
    * multi-GB single cell (executor OOM). Postings are therefore CAPPED
    * at `bloomThreshold` per term (row_number in the same term-shuffle
    * window): rare terms (term_freq <= threshold) keep complete lists;
    * hot terms keep a doc_id-ordered sample plus a bloom filter over
    * their FULL doc-id set, built by per-partition partial blooms merged
    * with `mergeInPlace` — no full list is ever materialized in one
    * place. `term_freq` stays the true document frequency (it feeds
    * idf). Search already scores hot terms via the bloom approximation
    * (fq=1, len=avgdl, bm25_agg.rs:162-188), so dropping their tails
    * loses nothing the scorer would use.
    */
  def createBm25Table(
      docs: DataFrame,
      idCol: String,
      termsCol: String,
      bloomThreshold: Int = DefaultBloomThreshold): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(termsCol).as("terms"))

    val toks = base.select(
      $"doc_id", size($"terms").as("doc_len"), explode($"terms").as("term"))

    // per (doc, term) frequency — partial-aggregated map-side.
    // Materialized ONCE: the hot-term collect below is a separate
    // action, the partial-bloom pass is an RDD lineage, and the
    // rare/hot branches are separate subtrees — without this each
    // re-runs the tokenize→explode→shuffle pipeline. An index build
    // materializes comparable data anyway; blocks spill to disk and
    // are dropped when the plan is GC'd.
    val tf = toks.groupBy($"term", $"doc_id")
      .agg(count(lit(1)).cast("int").as("fq"), first($"doc_len").as("doc_len"))
      .localCheckpoint()

    // hot/rare split WITHOUT windowing the full data: term document
    // frequencies partial-aggregate to tiny (term, df) rows; only the
    // (few) hot terms pay the row_number sort that caps their postings
    val counts = tf.groupBy($"term").agg(count(lit(1)).cast("int").as("df"))
    val hotTerms = counts.where($"df" > bloomThreshold)
    val hotCounts = hotTerms.as[(String, Int)].collect().toMap
    val tfTagged = tf.join(
      broadcast(hotTerms.withColumnRenamed("df", "__hot_df")), Seq("term"), "left")

    val invRare = tfTagged.where($"__hot_df".isNull)
      .groupBy($"term")
      .agg(
        count(lit(1)).cast("int").as("term_freq"),
        sort_array(collect_list(struct($"doc_id", $"fq", $"doc_len")))
          .as("postings"))

    val byTerm = org.apache.spark.sql.expressions.Window
      .partitionBy($"term").orderBy($"doc_id")
    val invHot = tfTagged.where($"__hot_df".isNotNull)
      .withColumn("rn", row_number().over(byTerm))
      .where($"rn" <= bloomThreshold)
      .groupBy($"term")
      .agg(
        first($"__hot_df").as("term_freq"),
        sort_array(collect_list(struct($"doc_id", $"fq", $"doc_len")))
          .as("postings"))
    val hotBlooms: DataFrame =
      if (hotCounts.isEmpty)
        Seq.empty[(String, Array[Byte])].toDF("term", "doc_ids_bloom")
      else {
        val hotB = spark.sparkContext.broadcast(hotCounts)
        tf.select($"term", $"doc_id").as[(String, Long)]
          .rdd
          .mapPartitions { it =>
            val hot = hotB.value
            val m = scala.collection.mutable.HashMap.empty[String, BloomFilter]
            it.foreach { case (t, id) =>
              if (hot.contains(t)) {
                m.getOrElseUpdate(t,
                  BloomFilter.create(math.max(hot(t), 1).toLong, 0.01))
                  .putLong(id)
              }
            }
            m.iterator
          }
          .reduceByKey { (a, b) => a.mergeInPlace(b); a }
          .mapValues { bf =>
            val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
          }
          .toDF("term", "doc_ids_bloom")
      }

    val invHotWithBloom = invHot
      .join(hotBlooms, Seq("term"), "left")

    val inv = invRare
      .withColumn("doc_ids_bloom", lit(null).cast("binary"))
      .unionByName(invHotWithBloom)
      .select(
        $"term",
        $"term_freq",
        size($"postings").as("doc_ids_len"),
        transform($"postings", p => p.getField("doc_id")).as("doc_ids"),
        transform($"postings", p => p.getField("fq")).as("fqs"),
        transform($"postings", p => p.getField("doc_len")).as("doc_lens"),
        $"doc_ids_bloom")
      .withColumn("avg_doc_len", lit(null).cast("double"))

    inv.unionByName(corpusStatsRow(docs, idCol, termsCol))
  }

  /** Just the `term IS NULL` corpus-stats row (one aggregation — much
    * cheaper than a full index build when only stats are needed, e.g.
    * when consolidating incrementally-built term rows). */
  def corpusStatsRow(docs: DataFrame, idCol: String, termsCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(termsCol).as("terms"))
      .agg(count(lit(1)).as("n"), avg(size($"terms")).as("avgdl"))
      .select(
        lit(null).cast("string").as("term"),
        $"n".cast("int").as("term_freq"),
        ($"avgdl" * 100).cast("int").as("doc_ids_len"),
        lit(null).cast("array<bigint>").as("doc_ids"),
        lit(null).cast("array<int>").as("fqs"),
        lit(null).cast("array<int>").as("doc_lens"),
        lit(null).cast("binary").as("doc_ids_bloom"),
        $"avgdl".as("avg_doc_len"))
  }

  /** BM25 term-score column from (fq, doc_len, df) given corpus stats. */
  def termScore(
      fq: Column, docLen: Column, df: Column,
      corpusSize: Long, avgDocLen: Double,
      k1: Double = DefaultK1, b: Double = DefaultB): Column = {
    val idf = log(
      (lit(corpusSize.toDouble) - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    idf * (fq * lit(k1 + 1.0)) /
      (fq + lit(k1) * (lit(1.0 - b) + lit(b) * docLen / lit(avgDocLen)))
  }

  /** Corpus stats from the inverted table's NULL-term row. */
  def corpusStats(inv: DataFrame): (Long, Double) = {
    val row = inv.where(col("term").isNull)
      .select(col("term_freq").cast("long"), col("avg_doc_len"))
      .head()
    (row.getLong(0), row.getDouble(1))
  }

  /** Top-`limit` documents for `queryTerms`, scored per the reference
    * formula; returns (doc_id, bm25) ordered by bm25 desc, doc_id asc.
    */
  def searchBm25(
      inv: DataFrame,
      queryTerms: Seq[String],
      limit: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB): DataFrame = {
    val spark = inv.sparkSession
    import spark.implicits._

    val terms = queryTerms.distinct

    // tiny (<= |terms|+1 rows); materialized ONCE so corpus stats, the
    // rare/common split and the fallback check don't recompute the full
    // inverted index. localCheckpoint, not cache(): the result plan
    // returned to the caller references these rows, so a cache entry
    // could never be safely unpersisted here — it would pin
    // block-manager memory per search forever, and a leaked cache
    // fragment can shadow a LogicalRelation and silently disable
    // planner rules. Checkpoint blocks are dropped by the
    // ContextCleaner when the plan is GC'd.
    //
    // The stats row rides along (`term IS NULL` kept) for two reasons:
    // corpusStats reads it from the checkpoint instead of re-running
    // the index pipeline a second time, and keeping the union's stats
    // branch alive stops the optimizer from tightening the nullable
    // array columns to non-null — a logical-vs-optimized nullability
    // disagreement the checkpoint's LogicalRDD warned about on every
    // search.
    val matched = inv
      .where($"term".isNull || $"term".isin(terms: _*)).localCheckpoint()
    val (n, avgdl) = corpusStats(matched)
    val termRows = matched.where($"term".isNotNull)

    // common terms (bloom present): collected as driver metadata —
    // bounded by query term count, and each filter is deserialized
    // ONCE here; executors receive the parsed BloomFilter (it is
    // Serializable) via broadcast, so probes are allocation-free.
    val commonMeta = termRows.where($"doc_ids_bloom".isNotNull)
      .select($"term_freq".cast("double"), $"doc_ids_bloom")
      .collect()
      .map(r => (termScoreScala(1.0, avgdl, r.getDouble(0), n, avgdl, k1, b),
        BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))))

    val hasRare = !termRows.where($"doc_ids_bloom".isNull).isEmpty

    // Exact path: explode stored postings. When the query has NO rare
    // terms at all, score the common terms' stored postings exactly
    // instead — the reference likewise only switches to the bloom
    // approximation when exact candidates exist (bm25_agg.rs:210-218);
    // without this an all-stopword query would return nothing.
    val exactTerms =
      if (hasRare) termRows.where($"doc_ids_bloom".isNull) else termRows

    val exact = exactTerms
      .select($"term_freq",
        explode(arrays_zip($"doc_ids", $"fqs", $"doc_lens")).as("p"))
      .select(
        $"p.doc_ids".as("doc_id"),
        $"p.fqs".cast("double").as("fq"),
        $"p.doc_lens".cast("double").as("doc_len"),
        $"term_freq".cast("double").as("df"))
      .withColumn("score", termScore($"fq", $"doc_len", $"df", n, avgdl, k1, b))
      .groupBy($"doc_id")
      .agg(sum($"score").as("bm25"))

    // approximate path: common terms contribute a constant fq=1,
    // len=avgdl score to candidate docs in their bloom
    // (bm25_agg.rs:162-188); only applied on top of exact candidates
    val scored = if (commonMeta.isEmpty || !hasRare) exact else {
      val bcast = spark.sparkContext.broadcast(commonMeta)
      val bonus = udf { id: Long =>
        bcast.value.iterator
          .filter { case (_, bf) => bf.mightContainLong(id) }
          .map(_._1).sum
      }
      exact.withColumn("bm25", $"bm25" + bonus($"doc_id"))
    }

    scored.orderBy($"bm25".desc, $"doc_id").limit(limit)
  }

  /** Scala-side scoring (driver constants for the bloom path). */
  private[graft] def termScoreScala(
      fq: Double, docLen: Double, df: Double,
      corpusSize: Long, avgDocLen: Double,
      k1: Double, b: Double): Double = {
    val idf = math.log((corpusSize.toDouble - df + 0.5) / (df + 0.5) + 1.0)
    idf * (fq * (k1 + 1.0)) / (fq + k1 * (1.0 - b + b * docLen / avgDocLen))
  }

  /** Stem + stopword-filter a query string on the driver (no Spark job
    * — the same analyzer `text_to_stem_array` applies per-row). */
  def analyzeQuery(query: String): Seq[String] = {
    val stops = PorterStemmer.defaultStopwords
    query.toLowerCase.split("[^\\p{L}\\p{N}]+").iterator
      .filter(_.nonEmpty)
      .map(PorterStemmer.stem)
      .filterNot(stops.contains)
      .toSeq
  }

  /** End-to-end: analyze raw text, build/probe index, join content back.
    * `search_bm25` analog (bm25_api.sql:63-105). Pass `prebuilt` to
    * search an existing inverted table instead of rebuilding one per
    * query (the production shape — build once, search many).
    */
  def searchText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      limit: Int,
      k1: Double = DefaultK1,
      b: Double = DefaultB,
      joinContent: Boolean = false,
      prebuilt: Option[DataFrame] = None): DataFrame = {
    import graft.functions.text_to_stem_array
    val terms = analyzeQuery(query)
    val inv = prebuilt.getOrElse {
      val analyzed = docs.select(
        col(idCol).cast("long").as("doc_id"),
        text_to_stem_array(col(textCol)).as("terms"))
      createBm25Table(analyzed, "doc_id", "terms")
    }
    val hits = searchBm25(inv, terms, limit, k1, b)
    if (joinContent) hits.join(docs, hits("doc_id") === docs(idCol), "left")
    else hits
  }

  /** Merge duplicate term rows after incremental appends
    * (`consolidate_bm25_table`, bm25_api.sql:108-165). Source rows come
    * from DISJOINT document batches, so:
    *  - true document frequency = Σ source term_freqs (NOT the size of
    *    the merged-then-capped posting arrays — a hot term's stored
    *    postings are a sample);
    *  - corpus-stats rows merge to (Σ n, n-weighted avgdl);
    *  - blooms are rebuilt over the union of STORED ids. For rows that
    *    were already bloom-capped, tail ids beyond the cap are absent —
    *    the same approximation the capped posting arrays carry.
    */
  def consolidate(inv: DataFrame, bloomThreshold: Int = DefaultBloomThreshold): DataFrame = {
    val spark = inv.sparkSession
    import spark.implicits._
    // merge all stats rows into one (weighted by corpus size)
    val stats = inv.where($"term".isNull)
      .agg(
        sum($"term_freq").as("n"),
        (sum($"avg_doc_len" * $"term_freq") / sum($"term_freq")).as("avgdl"))
      .select(
        lit(null).cast("string").as("term"),
        $"n".cast("int").as("term_freq"),
        ($"avgdl" * 100).cast("int").as("doc_ids_len"),
        lit(null).cast("array<bigint>").as("doc_ids"),
        lit(null).cast("array<int>").as("fqs"),
        lit(null).cast("array<int>").as("doc_lens"),
        lit(null).cast("binary").as("doc_ids_bloom"),
        $"avgdl".as("avg_doc_len"))
    val bloomUdf = udf { ids: Seq[Long] => bloomBytes(ids) }
    val merged = inv.where($"term".isNotNull)
      .groupBy($"term")
      .agg(
        sum($"term_freq").cast("int").as("term_freq"),
        sort_array(flatten(collect_list(
          zip_with($"doc_ids", arrays_zip($"fqs", $"doc_lens"), (id, p) =>
            struct(id.as("doc_id"), p.getField("fqs").as("fq"),
              p.getField("doc_lens").as("doc_len")))))).as("postings"))
      .select(
        $"term",
        $"term_freq",
        // merged lists re-capped like createBm25Table (inputs already
        // <= threshold per source row, so the pre-slice merge is
        // bounded by #duplicate rows x threshold)
        slice($"postings", 1, bloomThreshold).as("postings"),
        transform($"postings", p => p.getField("doc_id")).as("all_ids"))
      .select(
        $"term",
        $"term_freq",
        size($"postings").as("doc_ids_len"),
        transform($"postings", p => p.getField("doc_id")).as("doc_ids"),
        transform($"postings", p => p.getField("fq")).as("fqs"),
        transform($"postings", p => p.getField("doc_len")).as("doc_lens"),
        when($"term_freq" > bloomThreshold, bloomUdf($"all_ids"))
          .otherwise(lit(null).cast("binary")).as("doc_ids_bloom"))
      .withColumn("avg_doc_len", lit(null).cast("double"))
    merged.unionByName(stats)
  }

  /** Score ONE document against a query using the stored corpus stats —
    * `bm25_score(table, document, query)` (bm25_agg.rs:61-122). Both
    * strings go through the same analyzer as indexing; document
    * frequencies come from the inverted table (collect of <= |query|
    * tiny rows), the term frequencies from the document itself.
    */
  def bm25Score(
      inv: DataFrame,
      document: String,
      query: String,
      k1: Double = DefaultK1,
      b: Double = DefaultB): Double = {
    val (n, avgdl) = corpusStats(inv)
    val docTerms = analyzeQuery(document)
    val qTerms = analyzeQuery(query).distinct
    if (docTerms.isEmpty || qTerms.isEmpty) return 0.0
    val fqs = docTerms.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val dfs = inv.where(col("term").isin(qTerms: _*))
      .select(col("term"), col("term_freq").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    qTerms.iterator.flatMap { t =>
      for (fq <- fqs.get(t); df <- dfs.get(t)) yield
        termScoreScala(fq.toDouble, docTerms.size.toDouble, df, n, avgdl, k1, b)
    }.sum
  }
}

package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All shapes are shuffle-minimal and hold at 100 TB:
  *  - exact dedup: one hash-partitioned groupBy on the key.
  *  - MinHash LSH: per-row signature (map-side, no shuffle) → explode
  *    `bands` rows per doc → groupBy band bucket (shuffle is bands×docs
  *    small rows, not the text) → within-bucket pairs → exact-jaccard
  *    verify via two id-joins. Bucket size capped to bound skew.
  *  - SimHash: per-row 64-bit sketch (map-side only).
  */
object Dedup {

  /** Deterministic multiply-add hash family parameters (fixed seed);
    * used by [[MinHashSig]]. */
  private[ops] def hashFamilyFor(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(42)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd multipliers
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  // ------------------------------------------------------------- exact

  /** Groups of exact duplicates on `keyCols`: (keeper = min id, n). */
  def exactDupGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))
      .select("keeper_id", "n_dups")

  /** Drop exact duplicates, keeping the min-id row per key. */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  // ----------------------------------------------------------- minhash

  /** MinHash signature (array<long>, length `numHashes`) of a token
    * array: min over elements of k multiply-add permutation hashes of
    * xxhash64(token). Native expression — one tight codegen'd loop with
    * wrapping arithmetic (ANSI-safe). */
  def minhashSignature(tokens: Column, numHashes: Int = 128): Column = {
    val hashes = transform(array_distinct(tokens), t => xxhash64(t))
    GraftSqlShim.column(
      MinHashSig(GraftSqlShim.expression(hashes), numHashes))
  }

  /** Word n-gram shingles joined by space; empty when < n tokens. */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n), i =>
        concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Jaccard similarity of two arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val u = size(array_distinct(concat(a, b)))
    when(u === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / u.cast("double"))
  }

  /** Jaccard of two SORTED-distinct array<long> columns via a single
    * codegen'd merge scan — no per-row hash-set allocation. The hot
    * verification path for minhash candidates (millions of pairs ×
    * hundreds of elements each). */
  def sortedJaccard(a: Column, b: Column): Column =
    GraftSqlShim.column(
      SortedJaccard(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** LSH candidate pairs + exact-jaccard verification.
    *
    * Output is ALL verified pairs, which is inherently quadratic in
    * duplicate-cluster size (a 2,400-doc near-dup cluster IS ~2.9M true
    * pairs — that's the answer, not an artifact). Earlier versions
    * dropped buckets larger than `maxBucket` on the theory that other
    * bands re-find their pairs; that is false precisely for mega
    * duplicate clusters, which co-bucket in EVERY band (at j≥0.8 the
    * per-band collision probability is ~0.4) — the biggest clusters are
    * exactly what dedup exists to find. Now no bucket is dropped:
    *  - identical member sets recur across all bands, so buckets are
    *    deduped by content before any pair explode (one mega cluster →
    *    one bucket row instead of `bands` copies);
    *  - buckets over `maxBucket` switch from a single-task pair explode
    *    to an anchor-split explode redistributed across the cluster, so
    *    the O(n²) generation parallelizes instead of skewing one task.
    * When only dedup decisions (not the full pair list) are needed at
    * 100 TB, use [[minhashDedupKeepers]] — linear output per cluster.
    *
    * @param df         input
    * @param idCol      stable id column (long-castable)
    * @param tokensCol  array<string> column to compare as a set
    * @param threshold  exact jaccard cutoff applied to candidates
    * @param numHashes  signature length (bands * rowsPerBand)
    * @param bands      LSH bands; rowsPerBand = numHashes / bands
    * @param maxBucket  bucket size above which pair generation switches
    *                   to the distributed anchor-split path (no bucket
    *                   is dropped)
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (toks, small, big) =
      minhashBuckets(df, idCol, tokensCol, numHashes, bands, maxBucket)

    val candidates = smallAllPairs(small).unionByName(bigAllPairs(big))

    // NOTE on a rejected optimization: pre-filtering candidates by the
    // signature-estimated jaccard (join sigs, compare components) was
    // measured SLOWER here — this corpus's candidates are mostly true
    // pairs, so the two extra 1 KB-sig joins cost more than they save.
    // It only pays when the LSH s-curve admits many mid-similarity
    // false candidates; revisit with corpus stats before re-adding.
    // Output distinct, not candidate distinct: verified pairs are far
    // fewer than candidates, and the broadcast path needs no candidate
    // shuffle at all (the chunked path dedups candidates itself).
    verifyPairsAuto(candidates, toks, threshold,
      graft.GraftConf.dedupBroadcastBytes(spark)).distinct()
  }

  /** Cross-corpus near-duplicate matches — the incremental-ingestion /
    * fuzzy-decontamination form: which NEW docs near-duplicate an
    * EXISTING (reference) doc. Same LSH machinery as
    * [[minhashNearDupPairs]] over the parity-remapped union (new ids →
    * 2k+1, ref ids → 2k), but candidates are filtered to cross-side
    * pairs BEFORE verification, so same-side duplicates cost nothing
    * quadratic. Returns `(new_id, ref_id, jaccard)` with jaccard ≥
    * `threshold`. Scale shape inherits the bucket pipeline: banded
    * LSH, content-deduped buckets, bounded explode, budget-gated
    * verification. */
  def crossMinhashMatches(
      newDf: DataFrame,
      refDf: DataFrame,
      idCol: String,
      tokensCol: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    val spark = newDf.sparkSession
    val n = newDf.select(
      (sideSafeId(col(idCol)) * 2 + 1).as("__xid"), col(tokensCol))
    val r = refDf.select(
      (sideSafeId(col(idCol)) * 2).as("__xid"), col(tokensCol))
    val (toks, small, big) =
      minhashBuckets(n.unionByName(r), "__xid", tokensCol,
        numHashes, bands, maxBucket)
    val candidates = smallAllPairs(small).unionByName(bigAllPairs(big))
      .where(pmod(col("id_a"), lit(2)) =!= pmod(col("id_b"), lit(2)))
    verifyPairsAuto(candidates, toks, threshold,
      graft.GraftConf.dedupBroadcastBytes(spark))
      .distinct()
      .select(
        // Arithmetic shiftright is exact floor-division by 2 for both
        // parities (2k+1 >> 1 == k, 2k >> 1 == k, negative k included)
        // — unlike `/`, which is double true-division and silently
        // loses precision above 2^53.
        shiftright(when(pmod(col("id_a"), lit(2)) === 1, col("id_a"))
          .otherwise(col("id_b")), 1).as("new_id"),
        shiftright(when(pmod(col("id_a"), lit(2)) === 0, col("id_a"))
          .otherwise(col("id_b")), 1).as("ref_id"),
        col("jaccard"))
  }

  /** Casts an id to long and raises if it falls outside ±2^62 — the
    * range where the parity encode `2k`/`2k+1` stays collision-free in
    * a 64-bit long. Hash-derived full-range ids must be remapped by the
    * caller; silently wrapping them would match the wrong documents. */
  private def sideSafeId(id: Column): Column = {
    val idL = id.cast("long")
    val bound = 1L << 62
    when(idL >= lit(-bound) && idL < lit(bound), idL)
      .otherwise(raise_error(concat(
        lit("crossMinhashMatches: id outside +/-2^62, parity encode would overflow: "),
        idL.cast("string"))))
  }

  /** New-corpus rows that do NOT near-duplicate any reference doc —
    * one anti-join on the [[crossMinhashMatches]] output. */
  def crossDedupKeep(
      newDf: DataFrame,
      refDf: DataFrame,
      idCol: String,
      tokensCol: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    val matched = crossMinhashMatches(newDf, refDf, idCol, tokensCol,
      threshold, numHashes, bands, maxBucket)
      .select(col("new_id").as("__mid")).distinct()
    newDf.join(matched,
      newDf(idCol).cast("long") === col("__mid"), "left_anti")
  }

  /** All in-bucket pairs of small buckets: two native generators
    * (posexplode + explode-of-slice) — the nested-transform pairsOf
    * form builds the full pair array through interpreted lambdas and
    * costs ~3× as much at millions of pairs. */
  private def smallAllPairs(small: DataFrame): DataFrame = {
    import small.sparkSession.implicits._
    small
      .select($"ids", posexplode($"ids").as(Seq("i", "id_a")))
      .where($"i" < size($"ids") - 1)
      .select($"id_a", explode(slice($"ids", $"i" + lit(2), size($"ids"))).as("id_b"))
  }

  /** All in-bucket pairs of oversized buckets: one row exploding to
    * O(n²) pairs would pin the whole generation on a single task — so
    * split per anchor id first (carrying only each anchor's TAIL, half
    * the array bytes) and shuffle so the quadratic generation spreads
    * cluster-wide. */
  private def bigAllPairs(big: DataFrame): DataFrame = {
    import big.sparkSession.implicits._
    big
      .select($"ids", posexplode($"ids").as(Seq("i", "id_a")))
      .where($"i" < size($"ids") - 1)
      .select($"id_a", slice($"ids", $"i" + lit(2), size($"ids")).as("tail"))
      .repartition(col("id_a"))
      .select($"id_a", explode($"tail").as("id_b"))
  }

  /** Shared LSH front end: (toks, small, big) where `toks` is
    * (id, sorted-distinct token hashes) and small/big are bucket member
    * lists (sorted id arrays, size > 1) at or above `maxBucket`.
    *
    * Distinct token HASHES are the working set: they feed the signature
    * AND the verification jaccard. Verifying on 8-byte hashes instead
    * of strings shrinks the candidate joins and makes set-intersection
    * integer comparisons; xxhash64 collisions would need ~2^32 tokens
    * per doc pair to matter. Sorted so verification is a codegen'd
    * merge scan ([[sortedJaccard]]).
    *
    * Two skew defenses beyond deduping identical member sets:
    *  1. OVERLAPPING oversized buckets are MERGED (connected components
    *     over the share-a-member bucket graph). A mega duplicate
    *     cluster co-buckets in every band with slightly different
    *     membership per band, so without merging its ~O(n²) pair list
    *     is generated once per band and only collapses in distinct() —
    *     measured 30× redundancy at sf0.1. Merging widens the candidate
    *     set (members of the union that never co-bucketed), which only
    *     costs extra verification — verified output can only gain true
    *     pairs, never lose or fabricate them.
    *  2. Small buckets whose members all fall inside one merged bucket
    *     are dropped — every pair they would generate is already
    *     generated by that merged bucket's explode.
    */
  private[graft] def minhashBuckets(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      numHashes: Int,
      bands: Int,
      maxBucket: Int): (DataFrame, DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._
    // ONE tokenize+hash+signature pass, materialized once: both the
    // banding below and the verifier's token sets derive from it
    // (separate checkpoints of `buckets` and `toks` used to evaluate
    // this map-side pipeline twice)
    val base = df.select(
      col(idCol).cast("long").as("id"),
      GraftSqlShim.column(SortedTokenHashes(
        GraftSqlShim.expression(col(tokensCol)))).as("toks"))
      .withColumn("sig",
        GraftSqlShim.column(MinHashSig(GraftSqlShim.expression($"toks"), numHashes)))
      .localCheckpoint()

    val banded = base.select(
      $"id",
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(slice($"sig", b * lit(r) + lit(1), lit(r))))).as(Seq("band", "bhash")))

    // dedupe buckets by member set BEFORE any quadratic explode;
    // checkpointed because small/big branches below re-reference it
    // several times inside one downstream job (Spark recomputes common
    // subtrees) and the row set is tiny (one row per non-trivial bucket)
    val buckets = banded
      .groupBy($"band", $"bhash")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .where(size($"ids") > 1)
      .select($"ids")
      .distinct()
      .localCheckpoint()

    val toks = base.select($"id", $"toks")
    val small = buckets.where(size($"ids") <= maxBucket)
    // materialized once: tiny (one row per oversized bucket), and the
    // generated bucket_id must stay stable across the branches below
    val rawBig = buckets.where(size($"ids") > maxBucket)
      .withColumn("bucket_id", monotonically_increasing_id())
      .localCheckpoint()
    if (rawBig.head(1).isEmpty) return (toks, small, rawBig.select($"ids"))

    // merge overlapping oversized buckets: components over the
    // share-a-member bucket graph (tiny — one node per oversized bucket)
    val bigMembers = rawBig.select($"bucket_id", explode($"ids").as("id"))
    val overlapEdges = bigMembers
      .groupBy($"id").agg(sort_array(collect_set($"bucket_id")).as("bs"))
      .where(size($"bs") > 1)
      .select(explode(pairsOf($"bs")).as("p"))
      .select($"p._1".as("id_a"), $"p._2".as("id_b"))
      .distinct()
    val bComp = connectedComponents(overlapEdges, "id_a", "id_b")
      .withColumnRenamed("id", "bucket_id")
    val withComp = bigMembers
      .join(bComp, Seq("bucket_id"), "left")
      .select(coalesce($"label", $"bucket_id").as("comp"), $"id")
    val merged = withComp
      .groupBy($"comp").agg(sort_array(collect_set($"id")).as("ids"))
      .localCheckpoint()

    // a member belongs to exactly one merged component (shared members
    // are what merged the buckets), so small buckets whose members all
    // map into ONE component are subsets of that merged bucket
    val memberComp = withComp.distinct()
    val redundantSmall = small
      .select($"ids", explode($"ids").as("id"))
      .join(memberComp, Seq("id"), "left")
      .groupBy($"ids")
      .agg(count(lit(1)).as("n"), count($"comp").as("nc"),
        countDistinct($"comp").as("dc"))
      .where($"n" === $"nc" && $"dc" === 1)
      .select($"ids")
    val keptSmall = small.join(redundantSmall, Seq("ids"), "left_anti")
    (toks, keptSmall, merged.select($"ids"))
  }

  /** Adaptive candidate verification: when the whole token-hash table
    * fits `broadcastBudget` bytes, broadcast it and verify map-side —
    * zero shuffle, the same adaptive switch as Spark's broadcast-join
    * threshold. Otherwise the blocked chunk verifier runs (the shape
    * that holds at 100 TB, where the table cannot be broadcast).
    * Both paths share [[SortedJaccard.computeArrays]], so results are
    * bit-identical whichever fires.
    */
  private[graft] def verifyPairsAuto(
      candidates: DataFrame,
      toks: DataFrame,
      threshold: Double,
      broadcastBudget: Long): DataFrame = {
    import toks.sparkSession.implicits._
    val bytes = toks
      .agg(coalesce(sum(size($"toks")), lit(0)).cast("long")).head().getLong(0) * 8L
    if (bytes <= broadcastBudget) verifyPairsBroadcast(candidates, toks, threshold)
    else verifyPairsChunked(candidates.distinct(), toks, threshold)
  }

  /** Map-side verification against a broadcast id → token-hash map.
    * Candidates need not be distinct (dedup the OUTPUT if pair rows
    * must be unique — it is far smaller than the candidate set). The
    * lookup+jaccard runs as a codegen'd expression, not a UDF: per-row
    * UDF invocation overhead is real at tens of millions of candidates.
    */
  private[graft] def verifyPairsBroadcast(
      candidates: DataFrame,
      toks: DataFrame,
      threshold: Double): DataFrame =
    verifyPairsWithBcast(candidates, broadcastToksMap(toks), threshold)

  /** Collect + broadcast the id → token-hash map once; callers that
    * verify several candidate sets in one regime (keepers' direct +
    * star + bridge passes) share a single collect. */
  private[graft] def broadcastToksMap(
      toks: DataFrame): org.apache.spark.broadcast.Broadcast[java.util.HashMap[Long, Array[Long]]] = {
    val spark = toks.sparkSession
    import spark.implicits._
    val data = toks.select($"id", $"toks").as[(Long, Array[Long])].collect()
    val m = new java.util.HashMap[Long, Array[Long]](data.length * 2)
    data.foreach { case (i, a) => m.put(i, a) }
    spark.sparkContext.broadcast(m)
  }

  private[graft] def verifyPairsWithBcast(
      candidates: DataFrame,
      bcast: org.apache.spark.broadcast.Broadcast[java.util.HashMap[Long, Array[Long]]],
      threshold: Double): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val jac = GraftSqlShim.column(BroadcastJaccard(
      GraftSqlShim.expression($"id_a"), GraftSqlShim.expression($"id_b"),
      bcast, threshold))
    candidates
      .withColumn("jaccard", jac)
      .where($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** Exact-jaccard verification of candidate (id_a, id_b) pairs against
    * the sorted token-hash sets, with BLOCKED data movement.
    *
    * The naive form (join each candidate with both token arrays, then
    * compare) ships ~|toks| bytes per CANDIDATE through two shuffles —
    * a 2,700-doc duplicate clique is 3.6M candidates × ~4 KB of hashes
    * = ~14 GB of shuffle for 20 MB of underlying data. Here ids are
    * hash-grouped into chunks of ~`chunkSize` docs and candidates into
    * (chunk_a, chunk_b) cells, so each cell moves its two chunk
    * payloads ONCE and verifies its pair subset locally (the blocked
    * matrix-multiply trick). Shuffle drops from O(pairs · doc_bytes) to
    * O(pairs · 16 B + cells · chunk_bytes); cells only materialize
    * where candidates exist, so sparse pair sets stay sparse. Per-cell
    * memory is 2 chunks (~2·chunkSize·doc_bytes), invariant to corpus
    * size — the knob that keeps this safe at 100 TB.
    *
    * Jaccard arithmetic is bit-identical to [[SortedJaccard]] (same
    * merge scan, same division), so results hash-match the join form.
    */
  private[graft] def verifyPairsChunked(
      candidates: DataFrame,
      toks: DataFrame,
      threshold: Double,
      chunkSize: Int = 512): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val nDocs = toks.count()
    val p = math.max(1L, nDocs / chunkSize)
    def chunkOf(c: Column): Column = pmod(xxhash64(c), lit(p))
    val cells = candidates
      .select($"id_a", $"id_b", chunkOf($"id_a").as("ga"), chunkOf($"id_b").as("gb"))
      .groupBy($"ga", $"gb")
      // parallel collect_lists in one agg consume rows in one order, so
      // pas(i)/pbs(i) stay aligned (same for ids/tss below)
      .agg(collect_list($"id_a").as("pas"), collect_list($"id_b").as("pbs"))
    val chunks = toks
      .groupBy(chunkOf($"id").as("g"))
      .agg(collect_list($"id").as("ids"), collect_list($"toks").as("tss"))
    val verifyCell = udf(
      (pas: Seq[Long], pbs: Seq[Long],
       idsA: Seq[Long], tssA: Seq[Seq[Long]],
       idsB: Seq[Long], tssB: Seq[Seq[Long]]) => {
        // the Seqs Spark hands over can be LinearSeqs — indexed access
        // on them is O(i), turning the pair loop quadratic (measured:
        // minutes instead of seconds per cell). Convert to arrays once.
        val pa = pas.toArray
        val pb = pbs.toArray
        val m = new java.util.HashMap[Long, Array[Long]](idsA.size + idsB.size)
        val ia = idsA.iterator
        val ta = tssA.iterator
        while (ia.hasNext) m.put(ia.next(), ta.next().toArray)
        val ib = idsB.iterator
        val tb = tssB.iterator
        while (ib.hasNext) m.put(ib.next(), tb.next().toArray)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        var i = 0
        while (i < pa.length) {
          val a = m.get(pa(i))
          val b = m.get(pb(i))
          if (a != null && b != null) {
            val j = SortedJaccard.computeArraysThresh(a, b, threshold)
            if (j >= threshold) out += ((pa(i), pb(i), j))
          }
          i += 1
        }
        out.toSeq
      })
    cells
      .join(chunks.select($"g".as("ga"), $"ids".as("ids_a"), $"tss".as("tss_a")), "ga")
      .join(chunks.select($"g".as("gb"), $"ids".as("ids_b"), $"tss".as("tss_b")), "gb")
      .select(explode(verifyCell(
        $"pas", $"pbs", $"ids_a", $"tss_a", $"ids_b", $"tss_b")).as("r"))
      .select($"r._1".as("id_a"), $"r._2".as("id_b"), $"r._3".as("jaccard"))
  }

  /** All ordered pairs (i<j) from a sorted id array, as struct array. */
  private def pairsOf(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)), y => struct(x.as("_1"), y.as("_2")))))

  /** Connected components over an undirected edge list: (id, label)
    * where `label` = min id in the component; only ids that appear in
    * an edge get a row.
    *
    * CONTRACTION, not fixed-cost label propagation: each round computes
    * `l(v) = min(v, min neighbor)` (one shuffle), then CONTRACTS the
    * graph onto the labels (edges relabeled, self-loops dropped,
    * deduped) and recurses on the contracted graph. Near-dup clusters
    * are clique-like, so round 1 contracts them to (almost) nothing.
    * Once the contracted graph fits `driverEdgeLimit` edges, the tail
    * is finished with a single driver-side union-find instead of more
    * distributed rounds — at that size each extra round is pure
    * fixed-cost overhead (shuffles + checkpoints over a few thousand
    * rows), which dominated this operator's wall time. 500k edges is
    * ~8 MB on the driver; near-dup graphs are clique-like, so one or
    * two rounds reach the threshold at any corpus scale. The union-find
    * tail also makes HIGH-DIAMETER graphs terminate: a pure path only
    * loses one edge per contraction round (min-neighbor labels shift
    * it), so purely distributed rounds would need O(diameter) passes —
    * after round 0 such graphs are tiny and the driver finishes them
    * exactly. Each label is always a member's id, so the composed
    * label is the component min.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50,
      driverEdgeLimit: Long = 500000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where($"src" =!= $"dst")
    ccContract(e0, maxIter, driverEdgeLimit)
  }

  private def ccContract(e: DataFrame, depth: Int, driverEdgeLimit: Long): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // both directions in ONE pass over `e` — a union of two selects
    // would evaluate the (possibly expensive) edge pipeline twice
    val sym = e.select(explode(array(
        struct($"src", $"dst"),
        struct($"dst".as("src"), $"src".as("dst")))).as("x"))
      .select($"x.src".as("src"), $"x.dst".as("dst"))
    val labels = sym.groupBy($"src".as("id"))
      .agg(least(first($"src"), min($"dst")).as("label"))
      .localCheckpoint()
    // near-dup graphs have far fewer vertices than edges — when the
    // materialized label table is small, broadcast it so the two
    // contraction joins stay map-side instead of sort-merge shuffling
    // the whole edge list twice (measured 6s → 2s at 4.3M edges)
    val lbl = if (labels.count() <= 2000000L) broadcast(labels) else labels
    val contracted = e
      .join(lbl.select($"id".as("src"), $"label".as("ls")), "src")
      .join(lbl.select($"id".as("dst"), $"label".as("ld")), "dst")
      .where($"ls" =!= $"ld")
      .select(least($"ls", $"ld").as("src"), greatest($"ls", $"ld").as("dst"))
      .distinct()
      .localCheckpoint()
    val nContracted = contracted.count()
    if (depth <= 0 || nContracted == 0) return labels
    val sub =
      if (nContracted <= driverEdgeLimit) driverUnionFind(contracted)
      else ccContract(contracted, depth - 1, driverEdgeLimit)
    labels
      .join(sub.select($"id".as("label"), $"label".as("sublabel")), Seq("label"), "left")
      .select($"id", coalesce($"sublabel", $"label").as("label"))
  }

  /** Path-compressed union-find on a collected (src, dst) edge list;
    * merged roots keep the smaller id, so the final root of every
    * vertex is its component's min id. Only used on contracted graphs
    * below `driverEdgeLimit` — bounded driver memory by construction.
    */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val rows = edges.select($"src", $"dst").as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long](rows.length * 2)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    rows.foreach { case (s, d) =>
      if (!parent.containsKey(s)) parent.put(s, s)
      if (!parent.containsKey(d)) parent.put(d, d)
      val rs = find(s)
      val rd = find(d)
      if (rs != rd) {
        if (rs < rd) parent.put(rd, rs) else parent.put(rs, rd)
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size())
    parent.keySet().forEach(id => out += ((id, find(id))))
    // RDD-backed, not a LocalRelation: up to ~1M rows must not be
    // embedded in the downstream plan tree
    spark.createDataset(spark.sparkContext.parallelize(out.toSeq, 4)).toDF("id", "label")
  }

  /** Dedup decision per document: (id, keeper_id) where keeper is the
    * min id of the doc's near-dup component (keeper == id for docs with
    * no near-dups). LINEAR output in corpus size — this, not the pair
    * list, is the 100 TB dedup path: a mega duplicate cluster costs one
    * component label per member instead of O(n²) pairs.
    *
    * Two regimes, switched on total token-table size (the broadcast-
    * join idea):
    *  - BROADCAST (table fits `spark.graft.dedup.broadcastBytes`):
    *    verify every candidate — including oversized-bucket all-pairs —
    *    map-side against the broadcast table; no candidate shuffle.
    *  - SCALE: connected components only need a connectivity-preserving
    *    edge subset, built by [[bigBucketStarEdges]] (iterated verified
    *    stars + triangle-pruned bridge candidates — see there for the
    *    exactness argument). A near-dup clique costs ~O(n) edges; a
    *    bucket mixing k clusters costs ~k rounds instead of a
    *    failed×bucket residue explosion (measured 8.8M residue pairs at
    *    sf0.1 from one 38%-impure band bucket — quadratic at scale).
    */
  def minhashDedupKeepers(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucket: Int = 1000,
      starRounds: Int = 16,
      leftoverPairBudget: Long = 2000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (toks, small, big) =
      minhashBuckets(df, idCol, tokensCol, numHashes, bands, maxBucket)

    // pairs whose BOTH endpoints sit in the SAME merged oversized
    // bucket are already covered by that bucket's own verification
    // machinery — all-pairs for under-limit buckets, the star path's
    // exactness guarantee (anchor / bridge / leftover) for the rest —
    // so surviving small band-fragments of a mega-cluster must not
    // re-emit them. Without this, a corpus that is one big near-dup
    // clique pays up to bands× duplicated verify work AND floods the
    // component step with tens of millions of redundant edges
    // (measured at a planted 10× corpus: 32.4M small-bucket pairs, of
    // which ~99% were intra-mega-bucket — the keepers job thrashed;
    // with the filter the pair set collapses to the genuine
    // cross-bucket remainder and components run driver-side).
    // Merged oversized buckets are disjoint (merging is by shared
    // member), so membership is a function: one broadcast-joined
    // lookup per endpoint.
    val bigMember = big
      .withColumn("__comp", monotonically_increasing_id())
      .select($"__comp", explode($"ids").as("id"))
      .localCheckpoint() // tiny: one row per oversized-bucket member
    val smallCand = smallAllPairs(small)
      .join(bigMember.select($"id".as("id_a"), $"__comp".as("__ca")),
        Seq("id_a"), "left")
      .join(bigMember.select($"id".as("id_b"), $"__comp".as("__cb")),
        Seq("id_b"), "left")
      .where($"__ca".isNull || $"__cb".isNull || $"__ca" =!= $"__cb")
      .select($"id_a", $"id_b")
    val toksBytes = toks
      .agg(coalesce(sum(size($"toks")), lit(0)).cast("long")).head().getLong(0) * 8L
    // the regime gate is token-table BYTES, which does not bound bucket
    // SIZE (1M near-identical short docs fit the byte budget but are
    // ~5·10¹¹ all-pairs candidates) — so buckets beyond
    // `allPairsBucketLimit` take the linear star-edge path in BOTH
    // regimes; only the verifier differs (map-side broadcast vs chunked)
    val allPairsLimit = graft.GraftConf.dedupAllPairsBucketLimit(spark)
    val bigDirect = big.where(size($"ids") <= allPairsLimit)
    val bigStar = big.where(size($"ids") > allPairsLimit)
    val rawEdges =
      if (toksBytes <= graft.GraftConf.dedupBroadcastBytes(spark)) {
        // broadcast regime: all-pairs candidates (small + capped big)
        // verify map-side (no shuffle, CC tolerates duplicate edges);
        // over-limit buckets run star rounds with the same broadcast
        // map — ONE collect shared across every pass
        val bcast = broadcastToksMap(toks)
        // the same pair can survive in several band fragments — dedupe
        // before paying the verify (merged big buckets are disjoint,
        // so bigAllPairs needs no distinct)
        val direct = verifyPairsWithBcast(
          smallCand.distinct().unionByName(bigAllPairs(bigDirect)),
          bcast, threshold)
          .select($"id_a", $"id_b")
        if (bigStar.head(1).isEmpty) direct
        else {
          val (starEdges, extraCand) = bigBucketStarEdges(
            bigStar, toks, threshold, starRounds, leftoverPairBudget,
            verify = (c, t) => verifyPairsWithBcast(c, bcast, t))
          direct.unionByName(starEdges).unionByName(
            verifyPairsWithBcast(extraCand, bcast, threshold)
              .select($"id_a", $"id_b"))
        }
      } else {
        // scale regime: iterated star rounds keep oversized buckets
        // linear; only bridge/leftover candidates hit the chunk verifier
        val (starEdges, extraCand) =
          bigBucketStarEdges(big, toks, threshold, starRounds, leftoverPairBudget)
        starEdges.unionByName(
          verifyPairsChunked(smallCand.unionByName(extraCand).distinct(),
            toks, threshold).select($"id_a", $"id_b"))
      }

    // checkpointed: the contraction loop references its input several
    // times per round — without this the whole verify pipeline above
    // would re-execute once per reference
    val edges = rawEdges.localCheckpoint()
    // when the edge list itself fits the broadcast budget (16 B/edge),
    // a single driver union-find beats any number of distributed
    // contraction rounds — each round is several shuffles over data
    // this small (measured 5.3s of rounds vs ~1.5s collect+UF)
    val nEdges = edges.count()
    val comp =
      if (nEdges * 16L <= graft.GraftConf.dedupBroadcastBytes(spark))
        driverUnionFind(edges.select($"id_a".as("src"), $"id_b".as("dst")))
      else connectedComponents(edges, "id_a", "id_b")
    df.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select($"id", coalesce($"label", $"id").as("keeper_id"))
  }

  /** Connectivity-preserving verified edges for oversized LSH buckets:
    * iterated star assignment with triangle-inequality pruning.
    *
    * Per round, each bucket's min UNASSIGNED id becomes the anchor;
    * every unassigned member is exact-verified against it. Members at
    * jaccard >= threshold join the anchor's group (star edges emitted);
    * the rest stay for the next round, so a bucket mixing k real
    * clusters resolves in ~k rounds of O(|bucket|) work — never the
    * failed×bucket quadratic residue this replaces. Rounds stop when
    * the remaining all-pairs work fits `leftoverPairBudget`, when a
    * round assigns almost nothing (the remainder is co-bucketed noise,
    * not clusters — more anchors can't shrink it, so the blocked
    * verifier takes the leftover pairs directly), or after `maxRounds`.
    *
    * EXACTNESS (why no true in-bucket edge is lost): jaccard distance
    * d = 1 − j is a metric (triangle inequality holds). For a true
    * edge (u, v) with j(u, v) >= t:
    *  - both in one group → connected through its anchor;
    *  - u assigned to group of anchor `a` in round r, v still
    *    unassigned then → v was verified against `a` that round, and
    *    d(a,v) <= d(a,u) + d(u,v) <= 2(1−t), i.e. j(a,v) >= 2t−1. So v
    *    is recorded as a BRIDGE candidate into that group, and v×group
    *    pairs are verified — (u,v) is found. Docs below 2t−1 against
    *    `a` provably cannot connect to `a`'s group and are skipped;
    *  - both never assigned → leftover all-pairs candidates.
    *
    * @return (verified edges (id_a,id_b) — star assignments plus any
    *         bridge edges the chunked bridge scan verified in-pass,
    *         candidate pairs still to verify at `threshold` —
    *         small-product bridge tails + leftover)
    */
  private[graft] def bigBucketStarEdges(
      big: DataFrame,
      toks: DataFrame,
      threshold: Double,
      maxRounds: Int = 16,
      leftoverPairBudget: Long = 2000000L,
      verify: (DataFrame, Double) => DataFrame = null,
      bridgeChunkFloor: Long = 8000000L,
      bridgeChunkRows: Int = 4096): (DataFrame, DataFrame) = {
    val spark = big.sparkSession
    import spark.implicits._
    // default verifier: the blocked chunk path (the 100 TB shape); the
    // broadcast regime passes a shared-broadcast map verifier instead
    val verifyFn: (DataFrame, Double) => DataFrame =
      if (verify != null) verify else (c, t) => verifyPairsChunked(c, toks, t)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    if (big.head(1).isEmpty) return (emptyPairs, emptyPairs)
    val thrBridge = math.max(0.0, 2 * threshold - 1)

    var unassigned = big.withColumn("bid", monotonically_increasing_id())
      .select($"bid", explode($"ids").as("id")).localCheckpoint()
    // one job per round yields BOTH loop stats: remaining member count
    // and the all-pairs cost of stopping now
    def stats(): (Long, Long) = {
      val row = unassigned.groupBy($"bid").agg(count(lit(1)).as("n"))
        .agg(
          coalesce(sum($"n"), lit(0)).cast("long").as("m"),
          // n*(n-1) is even so the double division is exact below 2^53
          coalesce(sum($"n" * ($"n" - 1) / 2), lit(0)).cast("long").as("p"))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    var (nUn, nPairs) = stats()

    val starParts = scala.collection.mutable.ListBuffer[DataFrame]()
    val groupParts = scala.collection.mutable.ListBuffer[DataFrame]()
    val midParts = scala.collection.mutable.ListBuffer[DataFrame]()
    var r = 0
    var stalled = false
    while (nUn > 0 && r < maxRounds && !stalled && nPairs > leftoverPairBudget) {
      val anchors = unassigned.groupBy($"bid").agg(min($"id").as("anchor"))
        .localCheckpoint()
      val cand = unassigned.join(anchors, "bid").where($"id" =!= $"anchor")
      // anchor = bucket-min of unassigned, so anchor < id always holds
      // and pairs are already in canonical (id_a < id_b) order; verify
      // at the BRIDGE threshold to keep the mid-similarity band too
      val vj = verifyFn(
        cand.select($"anchor".as("id_a"), $"id".as("id_b")), thrBridge)
        .localCheckpoint()
      val assigned = vj.where($"jaccard" >= threshold)
      starParts += assigned.select($"id_a", $"id_b")
      val curUn = unassigned
      // group/mid rows carry the anchor-jaccard so the bridge join can
      // range-prune (anchors get gj = 1.0, which the prune excludes
      // against every mid doc — their pair was already verified)
      groupParts +=
        anchors.select($"bid", lit(r).as("round"), $"anchor".as("id"), lit(1.0).as("gj"))
          .unionByName(assigned.select($"id_b".as("id"), $"jaccard".as("gj"))
            .join(curUn, "id").select($"bid", lit(r).as("round"), $"id", $"gj"))
      midParts += vj.where($"jaccard" < threshold)
        .select($"id_b".as("id"), $"jaccard".as("mj"))
        .join(curUn, "id").select($"bid", lit(r).as("round"), $"id", $"mj")
      unassigned = curUn
        .join(anchors.select($"bid", $"anchor"), "bid")
        .where($"id" =!= $"anchor")
        .join(assigned.select($"id_b".as("id")), Seq("id"), "left_anti")
        .select($"bid", $"id")
        .localCheckpoint()
      val prevUn = nUn
      val s = stats(); nUn = s._1; nPairs = s._2
      // rounds pay off while anchors strip whole clusters; once the
      // remainder is co-bucketed noise (tiny per-round shrink), the
      // blocked all-pairs verifier finishes cheaper than more rounds
      stalled = (prevUn - nUn) < math.max(64L, prevUn / 20)
      r += 1
    }

    // leftover all-pairs through the distributed anchor-split generator
    // (bigAllPairs), NOT a single-row pairsOf explode: the stall exit
    // can fire while nPairs is far above `leftoverPairBudget`, and a
    // one-task quadratic explode is exactly the skew this operator
    // exists to avoid
    val leftover = bigAllPairs(
      unassigned.groupBy($"bid")
        .agg(sort_array(collect_list($"id")).as("ids"))
        .where(size($"ids") > 1)
        .select($"ids"))
    // Bridge pass. REVERSE-triangle prune throughout: for an edge
    // (u, v) with j(u,v) >= t, |d(a,u) − d(a,v)| <= d(u,v) <= 1−t must
    // hold, i.e. j(a,v) <= j(a,u) + (1−t). A mid doc at j(a,u) = 0.65
    // cannot connect to a core member at j(a,v) = 0.95 — this cuts the
    // mid×group product when anchor similarities spread (and excludes
    // anchors, gj = 1.0, whose mid pairs were already verified). The
    // 1e-9 slack keeps pairs sitting exactly ON the bound (small
    // rational jaccards do hit it: mj = 2/3, gj = 13/15, j(u,v) = 0.8
    // exactly) from being lost to double rounding — slack only ADDS
    // candidates, and candidates are always exact-verified.
    //
    // In a near-clique the prune keeps almost everything, and the raw
    // mid×group join materializes |mids|·|group| rows inside ONE task
    // (the join key (bid, round) has a single hot value — measured
    // 6 GiB in one partition on a planted 10× mega-clique). So when
    // the product exceeds `leftoverPairBudget`, group members are
    // scanned in CHUNKS with early exit: a mid leaves the scan at its
    // FIRST verified edge into a group — group members are already
    // mutually connected through their anchor, so one edge is all the
    // component step needs; further edges into the same group are
    // redundant. Mids that exhaust every chunk have had every
    // in-band pair exact-verified (exactness preserved). The chunk
    // loop stops early once the remaining product fits the budget and
    // hands the tail to the caller's verifier as plain candidates.
    var bridgeEdges = emptyPairs
    var bridgeCand = emptyPairs
    if (midParts.nonEmpty) {
      val mids = midParts.reduce(_ unionByName _)
      val groups = groupParts.reduce(_ unionByName _)
        .select($"bid", $"round", $"id".as("gid"), $"gj")
      val prune = $"id" =!= $"gid" &&
        $"gj" <= $"mj" + lit(1.0 - threshold + 1e-9)
      def productOf(p: DataFrame, g: DataFrame): Long =
        p.groupBy($"bid", $"round").agg(count(lit(1)).as("nm"))
          .join(g.groupBy($"bid", $"round").agg(count(lit(1)).as("ng")),
            Seq("bid", "round"))
          .agg(coalesce(sum($"nm" * $"ng"), lit(0)).cast("long"))
          .head().getLong(0)
      // the chunked scan guards MATERIALIZATION (a hot-key join blob),
      // not verify work — so its trigger has a floor well above the
      // tunable pair budget: 8M pairs × 16 B ≈ 128 MB, spread by the
      // repartition, is safe anywhere, and per-iteration verifier
      // overhead only pays off beyond that
      val bridgeProductBudget = math.max(leftoverPairBudget, bridgeChunkFloor)
      if (productOf(mids, groups) <= bridgeProductBudget) {
        bridgeCand = mids.join(groups, Seq("bid", "round"))
          .where(prune)
          .select(least($"id", $"gid").as("id_a"),
            greatest($"id", $"gid").as("id_b"))
      } else {
        // per-(bid, round) scan position over rank-ordered group
        // members; the stride ADAPTS to the live pending count so each
        // iteration's candidate volume stays within the budget even
        // when the MID side dominates (a 300k-mid bucket at a fixed
        // 4096-wide stride would be 1.2B pairs in one iteration —
        // the very blob this loop exists to avoid). bridgeChunkRows
        // caps the stride so a few stragglers cannot turn the tail of
        // a huge group into one giant iteration. Superseded pending /
        // cand checkpoint generations become unreachable on
        // reassignment and the ContextCleaner reclaims their storage;
        // only the ve edge frames stay referenced (bounded: verified
        // edges only).
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"bid", $"round").orderBy($"gid")
        val ranked = groups
          .withColumn("rn", (row_number().over(w) - 1).cast("long"))
          .localCheckpoint()
        val maxGroup =
          ranked.agg(coalesce(max($"rn"), lit(0L))).head().getLong(0) + 1
        var pending = mids.localCheckpoint()
        var nPending = pending.count()
        val edgeParts = scala.collection.mutable.ListBuffer[DataFrame]()
        var off = 0L
        while (off < maxGroup && nPending > 0 &&
            productOf(pending, ranked.where($"rn" >= off)) >
              bridgeProductBudget) {
          val width = math.max(1L, math.min(bridgeChunkRows.toLong,
            bridgeProductBudget / math.max(1L, nPending)))
          val cand = pending
            .join(ranked.where($"rn" >= off && $"rn" < off + width),
              Seq("bid", "round"))
            .where(prune)
            .select($"bid", $"round", $"id".as("mid"),
              least($"id", $"gid").as("id_a"),
              greatest($"id", $"gid").as("id_b"))
            // spread the hot-key join output before the map-side verify
            .repartition($"id_a")
            .localCheckpoint()
          val ve = verifyFn(cand.select($"id_a", $"id_b"), threshold)
            .select($"id_a", $"id_b").localCheckpoint()
          edgeParts += ve
          // a verified edge connects the mid to that (bid, round)
          // group — the rest of THAT group's scan is redundant for it
          val matched = ve.join(cand, Seq("id_a", "id_b"))
            .select($"bid", $"round", $"mid".as("id")).distinct()
          pending = pending
            .join(matched, Seq("bid", "round", "id"), "left_anti")
            .localCheckpoint()
          nPending = pending.count()
          off += width
        }
        if (edgeParts.nonEmpty)
          bridgeEdges = edgeParts.reduce(_ unionByName _)
        if (nPending > 0 && off < maxGroup)
          bridgeCand = pending
            .join(ranked.where($"rn" >= off), Seq("bid", "round"))
            .where(prune)
            .select(least($"id", $"gid").as("id_a"),
              greatest($"id", $"gid").as("id_b"))
      }
    }
    val star =
      if (starParts.isEmpty) bridgeEdges
      else starParts.reduce(_ unionByName _).unionByName(bridgeEdges)
    (star, leftover.unionByName(bridgeCand))
  }

  // ----------------------------------------------------------- simhash

  /** 64-bit SimHash over a token array (native expression, codegen). */
  def simhash(tokens: Column): Column =
    simhashOf(transform(tokens, t => xxhash64(t)))

  /** SimHash over precomputed token hashes (array<long>) — lets the
    * caller swap the token hash (e.g. [[graft.functions.polyhash31]]
    * for an ANSI-SQL-replayable sketch). */
  def simhashOf(hashes: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(hashes)))

  /** Hamming distance between two 64-bit sketches. */
  def simhashHamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: split the 64-bit sketch into `numChunks`
    * equal-width blocking keys, bucket on each, verify full hamming
    * <= maxHamming inside buckets. By pigeonhole two sketches within
    * hamming <= numChunks-1 agree exactly on at least one chunk, so
    * recall is exact iff `maxHamming < numChunks` (enforced). More
    * chunks tolerate more differing bits but shrink the key width
    * (64/numChunks bits → bigger buckets at scale); 4×16-bit is the
    * scale-safe default for the classic hamming<=3 regime.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 10000,
      numChunks: Int = 4,
      tokenHash: Column => Column = t => xxhash64(t)): DataFrame = {
    require(64 % numChunks == 0, s"numChunks must divide 64, got $numChunks")
    require(maxHamming < numChunks,
      s"maxHamming=$maxHamming needs > $maxHamming chunks for exact recall " +
        s"(pigeonhole); got numChunks=$numChunks")
    val width = 64 / numChunks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      simhashOf(transform(col(tokensCol), tokenHash)).as("sh"))
    val blocked = base.select($"id", $"sh",
      posexplode(array((0 until numChunks).map(i =>
        shiftrightunsigned($"sh", i * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("chunk", "key")))
    // two native generators (posexplode + explode-of-slice) — the
    // nested-transform pair form evaluates through interpreted lambdas
    val cands = blocked.groupBy($"chunk", $"key")
      .agg(sort_array(collect_list(struct($"id", $"sh"))).as("xs"))
      .where(size($"xs") > 1 && size($"xs") <= maxBucket)
      .select($"xs", posexplode($"xs").as(Seq("i", "a")))
      .where($"i" < size($"xs") - 1)
      .select($"a", explode(slice($"xs", $"i" + lit(2), size($"xs"))).as("b"))
      .select($"a.id".as("id_a"), $"a.sh".as("sh_a"),
        $"b.id".as("id_b"), $"b.sh".as("sh_b"))
      .distinct()
    cands.withColumn("hamming", simhashHamming($"sh_a", $"sh_b"))
      .where($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }

  // ---------------------------------------------------- line-level dedup

  /** Remove boilerplate lines: a line that occurs in more than
    * `maxDocFreq` DISTINCT documents is dropped from every document
    * (the CCNet/RefinedWeb-style corpus-level line filter — headers,
    * nav bars, cookie banners repeat across pages and poison training
    * data even when no two whole documents are near-dups).
    *
    * Returns (id, text) with offending lines removed; line order and
    * every line's exact bytes (including empty lines) are otherwise
    * preserved.
    *
    * Scale shape: lines explode with their position, the document
    * frequency aggregates on the line VALUE (partial map-side combine,
    * one shuffle keyed by line — skew-safe: the hottest line is still
    * one counter per partition, not a collected list), the hot-line
    * set joins back (broadcast when small, AQE otherwise), and the doc
    * reassembles ordered by position. No driver-side state.
    */
  def dropBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxDocFreq >= 1, "graft: maxDocFreq must be >= 1")
    val lines = df.select(
        col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    // distinct (id, line) before counting: a line repeated WITHIN one
    // doc counts once toward its document frequency. Empty lines are
    // never boilerplate — dropping them would collapse paragraph
    // structure corpus-wide.
    val hot = lines.select($"line", $"id").distinct()
      .where(length($"line") > 0)
      .groupBy($"line").agg(count(lit(1)).as("df"))
      .where($"df" > maxDocFreq)
      .select($"line")
    val kept = lines
      .join(hot.withColumn("__hot", lit(1)), Seq("line"), "left")
      .where($"__hot".isNull)
      .groupBy($"id")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct($"pos", $"line"))),
          x => x.getField("line"))).as("text"))
    // docs whose every line was boilerplate still come back (empty)
    df.select(col(idCol).cast("long").as("id"))
      .join(kept, Seq("id"), "left")
      .select($"id", coalesce($"text", lit("")).as("text"))
  }

  // ------------------------------------------ embedding near-duplicate

  /** Near-duplicate pairs by embedding cosine distance, blocked on a
    * key column (an LSH bucket — see [[embeddingLshBucket]]).
    *
    * In-block comparison is all-pairs, so the blocking key must be
    * fine-grained. No block is dropped: the in-block comparison is a
    * self-JOIN on the block key, so an oversized (skewed) block is
    * split across tasks by AQE skew-join handling rather than pinning
    * one task — dropping it would silently lose exactly the most-
    * duplicated content (the minhash lesson). Pair output is inherently
    * quadratic in cluster size; feed [[connectedComponents]] when only
    * dedup decisions are needed at 100 TB.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      maxCosDist: Double): DataFrame = {
    import graft.functions.cos_dist
    val a = df.select(col(blockCol).as("blk"),
      col(idCol).cast("long").as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(blockCol).as("blk"),
      col(idCol).cast("long").as("id_b"), col(vecCol).as("v_b"))
    a.join(b, "blk")
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", cos_dist(col("v_a"), col("v_b")))
      .where(col("dist") < maxCosDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Random-hyperplane LSH bucket for embeddings (sign bits of `bits`
    * fixed random projections) — the scale path for cosine near-dup:
    * block on bucket, verify inside. */
  def embeddingLshBucket(vec: Column, dim: Int, bits: Int = 16): Column = {
    val rnd = new java.util.Random(7)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian().toFloat)
    val bucketBits = (0 until bits).map { i =>
      val plane = lit(planes(i))
      when(graft.functions.inner_product(vec, plane) > 0d,
        lit(1L << i)).otherwise(lit(0L))
    }
    bucketBits.reduce(_ + _)
  }

  /** Axis-aligned sign-LSH bucket: sign bits of the first `bits`
    * coordinates (hyperplanes = standard basis vectors — a valid, if
    * lower-quality, draw from the same random-hyperplane family).
    * Unlike [[embeddingLshBucket]] the key is exactly reproducible in
    * plain SQL (`embedding[i] > 0`), so results are oracle-checkable
    * bit-for-bit with no floating-point dot-product ambiguity.
    */
  def embeddingLshBucketAxis(vec: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(vec, i + 1) > lit(0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}

/** Sorted-distinct xxhash64 (seed 42 — byte-identical to the built-in
  * `xxhash64` expression) of an array<string> in one native pass — the
  * minhash/verification working set. Replaces the HOF composition
  * `sort_array(array_distinct(transform(toks, xxhash64)))`, whose
  * transform lambda is CodegenFallback. */
case class SortedTokenHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_token_hashes expects array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_token_hashes"

  override def nullSafeEval(v: Any): Any =
    SortedTokenHashes.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.SortedTokenHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedTokenHashes =
    copy(child = newChild)
}

object SortedTokenHashes {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      set.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    ArrayData.toArrayData(out)
  }
}

/** MinHash signature of an array<long> of element hashes: for each of
  * `numHashes` fixed multiply-add permutations, the min hash value.
  * Wrapping 64-bit arithmetic (deliberate — it's a hash), single pass.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<bigint>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  // cache per signature length (always 128 in practice)
  private val families =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def compute(hashes: ArrayData, numHashes: Int): ArrayData = {
    val (a, b) = families.computeIfAbsent(numHashes, Dedup.hashFamilyFor)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = a(k) * h + b(k) // wrapping on purpose
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Exact jaccard of two doc ids resolved through a BROADCAST id →
  * sorted-token-hash map: −1.0 when either id is absent (filtered by
  * the caller's threshold). Codegen'd — the broadcast handle rides
  * into generated code as a reference object and deserializes once per
  * executor; per-row cost is two hash lookups + one merge scan, with
  * none of the per-row UDF invocation overhead (this sits under tens
  * of millions of candidate rows). */
case class BroadcastJaccard(
    left: Expression,
    right: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[java.util.HashMap[Long, Array[Long]]],
    threshold: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"broadcast_jaccard expects (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "broadcast_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    BroadcastJaccard.compute(a.asInstanceOf[Long], b.asInstanceOf[Long],
      bcast.value, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bcastJac", bcast,
      "org.apache.spark.broadcast.Broadcast")
    // raw-type cast: janino's generics support is too limited for a
    // parameterized cast in generated code
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.BroadcastJaccard.compute($a, $b, " +
        s"(java.util.HashMap) $ref.value(), $threshold)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BroadcastJaccard =
    copy(left = newLeft, right = newRight)
}

object BroadcastJaccard {
  def compute(a: Long, b: Long, m: java.util.HashMap[Long, Array[Long]],
      thr: Double): Double = {
    val x = m.get(a)
    val y = m.get(b)
    if (x == null || y == null) -1.0
    else SortedJaccard.computeArraysThresh(x, y, thr)
  }
}

/** Jaccard of two sorted-distinct array<long> sets: single merge scan,
  * no per-row hash set. |A∩B| by two-pointer walk; |A∪B| = |A|+|B|−|A∩B|.
  * Inputs MUST be sorted ascending and duplicate-free (see
  * [[Dedup.sortedJaccard]] callers — they sort_array(array_distinct)). */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.ops.SortedJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Thresholded merge scan: returns the EXACT jaccard when it is
    * >= thr, and any value < thr otherwise — callers that filter at
    * `thr` get identical results. Every 8 elements it checks the
    * reachable-jaccard upper bound (intersection so far + everything
    * remaining) and bails when the pair provably cannot reach `thr`;
    * a dissimilar same-length pair exits after ~11% of the scan at
    * thr = 0.8, which is most of the candidate volume in LSH
    * verification. */
  def computeArraysThresh(a: Array[Long], b: Array[Long], thr: Double): Double = {
    val na = a.length
    val nb = b.length
    var i = 0
    var j = 0
    var inter = 0
    var steps = 0
    while (i < na && j < nb) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
      steps += 1
      if ((steps & 7) == 0) {
        val remain = math.min(na - i, nb - j)
        val maxInter = inter + remain
        val minUnion = na + nb - maxInter
        if (minUnion > 0 && maxInter.toDouble / minUnion < thr)
          return maxInter.toDouble / minUnion
      }
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Same merge scan over plain arrays — used by the chunked verifier;
    * MUST stay arithmetically identical to [[compute]]. */
  def computeArrays(a: Array[Long], b: Array[Long]): Double = {
    val na = a.length
    val nb = b.length
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** 64-bit SimHash of an array<long> of token hashes: majority vote per
  * bit. Native expression so the hot loop stays in codegen. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

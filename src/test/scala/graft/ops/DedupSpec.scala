package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "spark engines about completely different content"), // permutation of 4's token bag
    (6L, "unrelated words entirely here banana apple")).toDF("id", "text")
    .withColumn("toks", tokenize($"text"))

  test("exactDedup keeps min id per key") {
    val kept = Dedup.exactDedup(docs, "id", Seq("text"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
    val groups = Dedup.exactDupGroups(docs, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) == 2L)
  }

  test("minhash signature: identical sets → identical signatures; jaccard tracks overlap") {
    val sigs = docs.select($"id", Dedup.minhashSignature($"toks", 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    def simEst(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    // docs 1,3 share 8/10 distinct tokens (j = 8/10); est within 0.25
    assert(math.abs(simEst(sigs(1L), sigs(3L)) - 8.0 / 10.0) < 0.25)
    assert(simEst(sigs(1L), sigs(6L)) < 0.3)
  }

  test("minhashNearDupPairs finds planted near-dups and respects threshold") {
    val pairs = Dedup.minhashNearDupPairs(docs, "id", "toks", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
    // doc 4/5: same token set (order differs) → jaccard 1.0
    assert(pairs.contains((4L, 5L)))
  }

  test("simhash: identical docs equal, near docs close, different docs far") {
    val sh = docs.select($"id", Dedup.simhash($"toks").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(6L)))
  }

  test("simhashNearDupPairs finds exact dup at hamming 0") {
    val pairs = Dedup.simhashNearDupPairs(docs, "id", "toks", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((4L, 5L))) // simhash ignores order: same bag → same sketch
  }

  test("minhashNearDupPairs keeps mega-cluster pairs when the bucket exceeds maxBucket") {
    // 30 near-identical docs (one cluster) + 10 distinct docs; with
    // maxBucket=5 the cluster's bucket is oversized in every band — the
    // old drop-the-bucket guard returned ZERO pairs for exactly this
    // shape. All 30*29/2 = 435 pairs must survive via the anchor-split.
    val base = (0 until 30).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa v$i")
    }
    val distinctDocs = (100 until 110).map { i =>
      (i.toLong, s"unique${i} totally separate subject matter number ${i} with words ${i * 7} ${i * 13} ${i * 17} ${i * 19}")
    }
    val df = (base ++ distinctDocs).toDF("id", "text")
      .withColumn("toks", tokenize($"text"))
    val pairs = Dedup.minhashNearDupPairs(df, "id", "toks", 0.7, maxBucket = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      i <- 0 until 30; j <- (i + 1) until 30
    } yield (i.toLong, j.toLong)).toSet
    assert(expected.subsetOf(pairs), s"missing ${(expected -- pairs).size} cluster pairs")
    assert(!pairs.exists(p => p._1 >= 100L && p._2 >= 100L))
  }

  test("connectedComponents labels transitive clusters with the min id") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: distributed rounds and driver union-find agree") {
    // short chain + two cliques, small enough that the fully
    // distributed path converges in a few contraction rounds
    val chain = (0L until 5L).map(i => (i, i + 1))
    val cliques = for {
      base <- Seq(1000L, 2000L); i <- 0 until 8; j <- (i + 1) until 8
    } yield (base + i, base + j)
    val edges = scala.util.Random.shuffle(chain ++ cliques).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val distributed = Dedup.connectedComponents(edges, "id_a", "id_b",
        maxIter = 50, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == distributed)
    assert((0L to 5L).forall(i => viaDriver(i) == 0L))
    assert((0 until 8).forall(i => viaDriver(1000L + i) == 1000L))
  }

  test("connectedComponents: driver union-find resolves a high-diameter chain") {
    // a 300-edge path barely contracts per distributed round (min-
    // neighbor labels shift it by one) — the driver union-find tail is
    // what makes high-diameter graphs terminate
    val edges = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 301 && labels.values.forall(_ == 0L))
  }

  test("bigBucketStarEdges: iterated star + bridge pruning preserves connectivity") {
    // one oversized bucket mixing: cluster A (anchor 1 + near-dups),
    // cluster B (docs 20-23, unrelated to A), and bridge doc 3 with
    // j(anchor, 3) = 0.75 in [2t-1, t) but j(2, 3) = 10/12 >= 0.8 —
    // the exact shape the triangle-pruned bridge pass must recover.
    val t = (1 to 12).map(i => s"t$i")
    def d(ts: Seq[String]) = ts
    val docs = Seq(
      1L -> d(t.take(10)), // anchor {t1..t10}
      2L -> d(t.take(11)), // {t1..t11}: j(1,2)=10/11
      3L -> d(t.slice(1, 12)), // {t2..t12}: j(1,3)=9/12=0.75, j(2,3)=10/12
      4L -> d(t.take(10)), 5L -> d(t.take(10)), 6L -> d(t.take(10)),
      20L -> d(Seq("x1", "x2", "x3", "x4", "x5")),
      21L -> d(Seq("x1", "x2", "x3", "x4", "x5")),
      22L -> d(Seq("x1", "x2", "x3", "x4", "x5", "x6")),
      23L -> d(Seq("x1", "x2", "x3", "x4", "x5", "x7")))
    val toks = docs.toDF("id", "ts").select(
      $"id",
      sort_array(array_distinct(transform($"ts", x => xxhash64(x)))).as("toks"))
    val big = Seq(Tuple1(docs.map(_._1).sorted)).toDF("ids")
    val (star, extra) = Dedup.bigBucketStarEdges(
      big, toks, 0.8, maxRounds = 16, leftoverPairBudget = 0L)
    val verified = star.unionByName(
      Dedup.verifyPairsChunked(extra.distinct(), toks, 0.8).select($"id_a", $"id_b"))
    val labels = Dedup.connectedComponents(verified, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    // bridge doc 3 must join cluster A through doc 2 (not the anchor)
    assert(labels(3L) == 1L, s"bridge doc lost: $labels")
    assert(labels(2L) == 1L && labels(4L) == 1L)
    assert(labels(20L) == 20L && labels(23L) == 20L)

    // the CHUNKED bridge scan (mega-clique guard: group members
    // scanned in bounded chunks, a mid leaves at its first verified
    // edge) must preserve the same components — force it with a floor
    // of 1 pair and 2-member chunks so several iterations and the
    // early exit genuinely run
    val (star2, extra2) = Dedup.bigBucketStarEdges(
      big, toks, 0.8, maxRounds = 16, leftoverPairBudget = 0L,
      bridgeChunkFloor = 1L, bridgeChunkRows = 2)
    val verified2 = star2.unionByName(
      Dedup.verifyPairsChunked(extra2.distinct(), toks, 0.8)
        .select($"id_a", $"id_b"))
    val labels2 = Dedup.connectedComponents(verified2, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels2 == labels, s"chunked bridge diverged: $labels2 vs $labels")
  }

  test("minhashDedupKeepers assigns keeper = component min, self for singletons") {
    val keepers = Dedup.minhashDedupKeepers(docs, "id", "toks", 0.7)
      .as[(Long, Long)].collect().toMap
    assert(keepers(1L) == 1L && keepers(2L) == 1L && keepers(3L) == 1L)
    assert(keepers(4L) == 4L && keepers(5L) == 4L)
    assert(keepers(6L) == 6L)
  }

  test("dedup broadcast and scale regimes produce identical results") {
    // one oversized-bucket cluster + distinct docs, like the mega-
    // cluster test; force the SCALE regime via a zero broadcast budget
    // and compare with the default (broadcast) regime
    val base = (0 until 30).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa v$i")
    }
    val distinctDocs = (100 until 110).map { i =>
      (i.toLong, s"unique${i} totally separate subject matter number ${i} with words ${i * 7} ${i * 13} ${i * 17} ${i * 19}")
    }
    val df = (base ++ distinctDocs).toDF("id", "text")
      .withColumn("toks", tokenize($"text"))
    def run(): (Set[(Long, Long)], Map[Long, Long]) = {
      val pairs = Dedup.minhashNearDupPairs(df, "id", "toks", 0.7, maxBucket = 5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val keepers = Dedup.minhashDedupKeepers(df, "id", "toks", 0.7,
          maxBucket = 5, leftoverPairBudget = 0L)
        .as[(Long, Long)].collect().toMap
      (pairs, keepers)
    }
    val (bPairs, bKeepers) = run()
    spark.conf.set(graft.GraftConf.DedupBroadcastBytes, "0")
    try {
      val (sPairs, sKeepers) = run()
      assert(bPairs == sPairs)
      assert(bKeepers == sKeepers)
    } finally spark.conf.unset(graft.GraftConf.DedupBroadcastBytes)
    assert((0 until 30).forall(i => bKeepers(i.toLong) == 0L))
  }

  test("broadcast regime routes over-limit buckets through star edges unchanged") {
    // same corpus as the regime-equality test; cap allPairsBucketLimit
    // below the merged-bucket size so the BROADCAST regime must take
    // the star-edge path for it (the token-byte gate alone would have
    // verified all pairs) — keepers must not change
    val base = (0 until 30).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa v$i")
    }
    val distinctDocs = (100 until 110).map { i =>
      (i.toLong, s"unique${i} totally separate subject matter number ${i} with words ${i * 7} ${i * 13} ${i * 17} ${i * 19}")
    }
    val df = (base ++ distinctDocs).toDF("id", "text")
      .withColumn("toks", tokenize($"text"))
    def keepers(): Map[Long, Long] =
      Dedup.minhashDedupKeepers(df, "id", "toks", 0.7,
          maxBucket = 5, leftoverPairBudget = 0L)
        .as[(Long, Long)].collect().toMap
    val direct = keepers()
    spark.conf.set(graft.GraftConf.DedupAllPairsBucketLimit, "8")
    val starred = try keepers()
    finally spark.conf.unset(graft.GraftConf.DedupAllPairsBucketLimit)
    assert(starred == direct)
    assert((0 until 30).forall(i => starred(i.toLong) == 0L))
  }

  test("randomized corpora: both regimes match brute-force components and pairs") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = (0 until 40).map(i => s"w$i")
    def mutate(base: Seq[String], edits: Int): Seq[String] = {
      var t = base.toVector
      (0 until edits).foreach { _ =>
        val i = rnd.nextInt(t.size)
        t = t.updated(i, vocab(rnd.nextInt(vocab.size)))
      }
      t
    }
    (0 until 3).foreach { trial =>
      // clusters of near-dups + singletons, sizes randomized
      val docs = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
      var id = 0L
      (0 until 4).foreach { c =>
        val base = Seq.fill(25)(vocab(rnd.nextInt(vocab.size)))
        val n = 2 + rnd.nextInt(8)
        (0 until n).foreach { _ =>
          docs += ((id, mutate(base, rnd.nextInt(3)))); id += 1
        }
      }
      (0 until 10).foreach { _ =>
        docs += ((id, Seq.fill(25)(vocab(rnd.nextInt(vocab.size))))); id += 1
      }
      val df = docs.toSeq.toDF("id", "toks")
      // brute force on distinct-token sets
      val sets = docs.map { case (i, ts) => i -> ts.distinct.toSet }.toMap
      def jac(a: Set[String], b: Set[String]): Double =
        if ((a ++ b).isEmpty) 0.0 else (a & b).size.toDouble / (a ++ b).size
      val truePairs = (for {
        a <- sets.keys; b <- sets.keys if a < b
        if jac(sets(a), sets(b)) >= 0.7
      } yield (a, b)).toSet

      def runPairs(): Set[(Long, Long)] =
        Dedup.minhashNearDupPairs(df, "id", "toks", 0.7, maxBucket = 4)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val bPairs = runPairs()
      spark.conf.set(graft.GraftConf.DedupBroadcastBytes, "0")
      val sPairs = try runPairs()
      finally spark.conf.unset(graft.GraftConf.DedupBroadcastBytes)
      // LSH at 32x4 bands has per-pair miss prob < 1e-7 at j >= 0.7 —
      // on these sizes both regimes must find the exhaustive truth
      assert(bPairs == truePairs, s"trial $trial broadcast: " +
        s"missing ${(truePairs -- bPairs).size} extra ${(bPairs -- truePairs).size}")
      assert(sPairs == truePairs, s"trial $trial scale")

      // keepers must equal union-find over the true pairs
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        r
      }
      truePairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = docs.map { case (i, _) => i -> find(i) }.toMap
      val keepers = Dedup.minhashDedupKeepers(df, "id", "toks", 0.7,
          maxBucket = 4, leftoverPairBudget = 0L)
        .as[(Long, Long)].collect().toMap
      assert(keepers == expect, s"trial $trial keepers")
    }
  }

  test("dropBoilerplateLines: corpus-hot lines removed, structure kept") {
    // "HEADER" in 3 docs (> maxDocFreq=2) → dropped everywhere;
    // "twice\ntwice" within ONE doc counts once → kept; blank lines
    // and order preserved; doc 4 is all-boilerplate → empty
    val docs = Seq(
      (1L, "HEADER\n\nbody one\ntwice\ntwice"),
      (2L, "HEADER\nbody two"),
      (3L, "HEADER\nbody three\n"),
      (4L, "HEADER"),
      (5L, "no header here")).toDF("id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "id", "text", maxDocFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "\nbody one\ntwice\ntwice")
    assert(out(2L) == "body two")
    assert(out(3L) == "body three\n")
    assert(out(4L) == "")
    assert(out(5L) == "no header here")
  }

  test("shingles and jaccard") {
    val df = Seq((Seq("a", "b", "c", "d"), 0)).toDF("t", "x")
    val sh = df.select(Dedup.shingles($"t", 3)).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq((Seq("a", "b"), 0)).toDF("t", "x")
      .select(Dedup.shingles($"t", 3)).head().getSeq[String](0)
    assert(short.isEmpty)
    val j = docs.where($"id" === 1).select(
      Dedup.jaccard($"toks", $"toks")).head().getDouble(0)
    assert(j == 1.0)
  }

  test("embedding near-dup via LSH bucket blocking finds self-similar vectors") {
    val rnd = new scala.util.Random(3)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 50).map(i => (i.toLong, vec()))
    // plant: 100+i = tiny perturbation of i
    val planted = base.take(5).map { case (i, v) =>
      (100L + i, v.map(x => x + 0.001f))
    }
    val df = (base ++ planted).toDF("id", "v")
      .withColumn("bucket", Dedup.embeddingLshBucket($"v", 16, 12))
    val pairs = Dedup.embeddingNearDupPairs(df, "id", "v", "bucket", 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"missing planted pair $i")
    }
  }

  test("crossMinhashMatches finds only cross-side near-dups, ids mapped back") {
    import graft.functions.tokenize
    val mk = (id: Long, t: String) => (id, t)
    // new 1 ~ ref 1 (identical), new 2 ~ new 3 (same-side dup: excluded),
    // ref 5 ~ ref 6 (same-side: excluded), new 4 unique
    val newDocs = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta"),
      mk(2L, "one two three four five six seven eight"),
      mk(3L, "one two three four five six seven eight"),
      mk(4L, "unique content nothing else matches this at all")
    ).toDF("doc_id", "text").select($"doc_id", tokenize($"text").as("toks"))
    val refDocs = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta"),
      mk(5L, "red green blue yellow purple orange pink white"),
      mk(6L, "red green blue yellow purple orange pink white")
    ).toDF("doc_id", "text").select($"doc_id", tokenize($"text").as("toks"))

    val m = Dedup.crossMinhashMatches(newDocs, refDocs, "doc_id", "toks", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(m == Set((1L, 1L, 1.0)))

    val keep = Dedup.crossDedupKeep(newDocs, refDocs, "doc_id", "toks", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(keep == Set(2L, 3L, 4L)) // same-side dups survive cross dedup
  }

  test("crossMinhashMatches: negative ids survive the parity encode/decode") {
    import graft.functions.tokenize
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val newDocs = Seq((-7L, t), (-2000000000000L, "totally different words here nothing shared at all"))
      .toDF("doc_id", "text").select($"doc_id", tokenize($"text").as("toks"))
    val refDocs = Seq((-9L, t))
      .toDF("doc_id", "text").select($"doc_id", tokenize($"text").as("toks"))
    val m = Dedup.crossMinhashMatches(newDocs, refDocs, "doc_id", "toks", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(m == Set((-7L, -9L, 1.0)))
  }

  test("crossMinhashMatches: ids beyond ±2^62 raise instead of wrapping") {
    import graft.functions.tokenize
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val newDocs = Seq((Long.MaxValue - 5, t))
      .toDF("doc_id", "text").select($"doc_id", tokenize($"text").as("toks"))
    val refDocs = Seq((1L, t))
      .toDF("doc_id", "text").select($"doc_id", tokenize($"text").as("toks"))
    val e = intercept[Exception] {
      Dedup.crossMinhashMatches(newDocs, refDocs, "doc_id", "toks", 0.8).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("parity encode")), e.toString)
  }
}

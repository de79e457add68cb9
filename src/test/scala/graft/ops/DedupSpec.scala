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

  test("minhashDedupKeepers assigns keeper = component min, self for singletons") {
    val keepers = Dedup.minhashDedupKeepers(docs, "id", "toks", 0.7)
      .as[(Long, Long)].collect().toMap
    assert(keepers(1L) == 1L && keepers(2L) == 1L && keepers(3L) == 1L)
    assert(keepers(4L) == 4L && keepers(5L) == 4L)
    assert(keepers(6L) == 6L)
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
}

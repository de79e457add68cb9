package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unit specs for the export-stage operators: mixture sampling,
  * distributed prefix sum / block packing / shuffle-sharding, and the
  * kNN seed classifier. */
class ExportOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------ mixture

  private lazy val mixDf = (0L until 1000L)
    .map(i => (i, if (i % 10 < 6) "en" else if (i % 10 < 9) "fr" else "zh"))
    .toDF("id", "g")

  test("mixture sampling is deterministic, rate-accurate, and monotone in rate") {
    val a = Mixture.sampleByRates(mixDf, "id", "g", Map("en" -> 0.4), "s1", 1.0)
      .select("id").as[Long].collect().toSet
    val b = Mixture.sampleByRates(mixDf, "id", "g", Map("en" -> 0.4), "s1", 1.0)
      .select("id").as[Long].collect().toSet
    assert(a == b, "same seed+rate must reproduce the same sample")
    val enKept = a.count(_ % 10 < 6)
    assert(math.abs(enKept - 600 * 0.4) < 60,
      s"en acceptance $enKept should be near 240 (hash uniformity)")
    assert(a.count(_ % 10 >= 6) == 400, "defaultRate=1 groups keep everything")
    // raising the rate only ADDS rows (threshold moves up)
    val wider = Mixture.sampleByRates(mixDf, "id", "g", Map("en" -> 0.7), "s1", 1.0)
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(wider), "higher rate must be a superset")
    // different seed → different sample
    val other = Mixture.sampleByRates(mixDf, "id", "g", Map("en" -> 0.4), "s2", 1.0)
      .select("id").as[Long].collect().toSet
    assert(a != other)
  }

  test("sampleToMixture hits target proportions and drops share-less groups") {
    val out = Mixture.sampleToMixture(
      mixDf, "id", "g", Map("en" -> 0.5, "fr" -> 0.5), targetRows = 400, seed = "m")
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byG.contains("zh"), "groups without a share are dropped")
    assert(math.abs(byG("en") - 200L) < 50, s"en ${byG("en")} ≈ 200")
    assert(math.abs(byG("fr") - 200L) < 50, s"fr ${byG("fr")} ≈ 200")
    // a group short of quota keeps everything (rate caps at 1)
    val starved = Mixture.sampleToMixture(
      mixDf, "id", "g", Map("zh" -> 1.0), targetRows = 5000, seed = "m")
    assert(starved.count() == 100L, "under-quota group keeps all rows")
  }

  test("mixturePlan reports counts, rates, thresholds") {
    val plan = Mixture.mixturePlan(mixDf, "g", Map("en" -> 1.0), 300)
    assert(plan == Seq(("en", 600L, 0.5, Mixture.threshold(0.5))))
    assert(Mixture.threshold(1.0) == Mixture.Mod)
    assert(Mixture.threshold(0.0) == 0L)
  }

  // ------------------------------------------- prefix sum / packing

  test("temperatureShares: alpha=1 is raw shares, alpha<1 upweights small groups") {
    val counts = Map("en" -> 900L, "zh" -> 100L)
    val raw = Mixture.temperatureShares(counts, 1.0).toMap
    assert(math.abs(raw("en") - 0.9) < 1e-12 && math.abs(raw("zh") - 0.1) < 1e-12)
    val t = Mixture.temperatureShares(counts, 0.5).toMap
    assert(t("zh") > 0.1 && t("en") < 0.9) // smoothing toward uniform
    assert(math.abs(t.values.sum - 1.0) < 1e-12)
    // sqrt(900)=30, sqrt(100)=10 → shares 0.75 / 0.25 exactly
    assert(t("en") == 0.75 && t("zh") == 0.25)
    val sampled = Mixture.sampleByTemperature(mixDf, "id", "g", 0.5, 300L, "t1")
    val byG = sampled.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh (smallest stratum) keeps a larger fraction than en
    assert(byG("zh").toDouble / 100 > byG("en").toDouble / 600)
    // a null group key must fail with the coalesce hint, not NPE in
    // the name sort
    val e = intercept[IllegalArgumentException] {
      Mixture.temperatureShares(Map("en" -> 1L, (null: String) -> 2L), 0.5)
    }
    assert(e.getMessage.contains("coalesce"), e.getMessage)
    val e2 = intercept[Exception] {
      Mixture.sampleByTemperature(
        mixDf.withColumn("g",
          when($"g" === "zh", lit(null: String)).otherwise($"g")),
        "id", "g", 0.5, 300L, "t1").count()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e2).exists(_.contains("non-null group")), e2.toString)
  }

  test("stratifiedSample: exact per-group counts, deterministic, subset-stable") {
    val s1 = graft.util.Sampling.stratifiedSample(mixDf, "id", "g", 20, "k")
    val byG = s1.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.values.forall(_ == 20L))
    val s2 = graft.util.Sampling.stratifiedSample(
      mixDf.repartition(7), "id", "g", 20, "k")
    assert(s1.select("id").as[Long].collect().toSet ==
      s2.select("id").as[Long].collect().toSet) // layout-invariant
    // n larger than a stratum returns the whole stratum
    val all = graft.util.Sampling.stratifiedSample(mixDf, "id", "g", 5000, "k")
    assert(all.count() == 1000)
  }

  test("lengthBatches: batch = global (len desc, id) rank div batchSize") {
    val df = (0L until 100L).map(i => (i, 1L + (i * 37) % 50)).toDF("id", "len")
    val got = Packing.lengthBatches(df, "id", col("len"), 8)
      .select("id", "batch").as[(Long, Long)].collect().toMap
    val expected = df.as[(Long, Long)].collect()
      .sortBy { case (id, len) => (-len, id) }
      .zipWithIndex.map { case ((id, _), r) => id -> (r / 8).toLong }.toMap
    assert(got == expected)
    // within any batch, every length >= any length of the NEXT batch
    val byBatch = expected.groupBy(_._2)
    val lens = df.as[(Long, Long)].collect().toMap
    byBatch.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byBatch(a).keys.map(lens).min >= byBatch(b).keys.map(lens).max)
      case _ =>
    }
  }

  test("saltedJoin: identical results to a plain join, salted plan shape") {
    val fact = (0L until 400L)
      .map(i => (i, if (i % 4 == 0) 1L else i % 50, i % 7))
      .toDF("row_id", "k", "v") // key 1 is hot (every 4th row)
    val dim = (0L until 50L).map(k => (k, k * 10)).toDF("k", "w")
    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "k", "v", "w").as[(Long, Long, Long, Long)]
      .collect().toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", col("row_id"), salts = 8)
      .select("row_id", "k", "v", "w").as[(Long, Long, Long, Long)]
    assert(salted.collect().toSet == plain)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(800))
    // left join keeps unmatched left rows exactly once
    val dimPart = dim.where($"k" < 10)
    val lj = SkewJoin.saltedJoin(fact, dimPart, "k", col("row_id"), 8, "left")
    assert(lj.count() == 400)
    assert(lj.where($"w".isNull).count() ==
      fact.join(dimPart, Seq("k"), "left").where($"w".isNull).count())
  }

  test("salted join splits a hot key across partitions (no >2/salts straggler)") {
    // force the shuffle path: broadcast would keep the left side in its
    // scan partitions and the salt would never reach a partitioner
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    // AQE would coalesce this deliberately tiny shuffle back into one
    // partition and hide the salt spread the test measures
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val salts = 8
      val hot = (0L until 8000L).map(i => (1L, i)).toDF("k", "row_id")
      val cold = (0L until 100L).map(i => (2L + i, 100000L + i)).toDF("k", "row_id")
      val fact = hot.union(cold)
      val dim = (1L to 200L).map(k => (k, k * 10)).toDF("k", "w")
      val joined = SkewJoin.saltedJoin(fact, dim, "k", col("row_id"), salts)
      val perPart = joined.where($"k" === 1L)
        .withColumn("pid", spark_partition_id())
        .groupBy("pid").count().collect().map(_.getLong(1))
      assert(perPart.sum == 8000L)
      assert(perPart.length > 1, "hot key landed in a single partition")
      // the straggler bound salting exists to provide: no partition may
      // hold more than 2/salts of the hot key's rows (a salt-pair hash
      // collision is the worst case at 64 shuffle partitions)
      assert(perPart.max <= perPart.sum * 2 / salts,
        s"straggler partition: ${perPart.sorted.reverse.toSeq}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("zorderKey: exact Morton interleave, range guard raises") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zorderKey($"x", $"y", 8)).as[Long].collect()
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .map { case (x, y) => morton(x, y, 8) }
    assert(got.toSeq == want)
    assert(want(3) == 65535L) // (255,255) fills all 16 bits
    intercept[Exception] {
      Seq((256L, 0L)).toDF("x", "y")
        .select(ZOrder.zorderKey($"x", $"y", 8)).collect()
    }
    // locality: z-sorted points chunk into blocks whose x/y ranges are
    // bounded (the row-group pruning property) — each 64-point block of
    // the 16x16 z-curve spans an 8x8 tile
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
    val sorted = grid
      .select($"x", $"y", ZOrder.zorderKey($"x", $"y", 4).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    sorted.grouped(64).foreach { block =>
      assert(block.map(_._1).max - block.map(_._1).min <= 7)
      assert(block.map(_._2).max - block.map(_._2).min <= 7)
    }
  }

  test("zorderKeyN: round-robin interleave, budget exhaustion, 2-ary parity") {
    // reference model of the documented assignment: round-robin from
    // the LSB over columns with bits left at each level
    def mortonN(vs: Seq[Long], budgets: Seq[Int]): Long = {
      var pos = 0
      var z = 0L
      for (level <- 0 until budgets.max; i <- budgets.indices if level < budgets(i)) {
        z |= ((vs(i) >> level) & 1L) << pos
        pos += 1
      }
      z
    }
    val budgets = Seq(3, 2, 1)
    val pts = Seq(Seq(7L, 3L, 1L), Seq(5L, 2L, 0L), Seq(0L, 0L, 1L), Seq(4L, 1L, 1L))
    val df = pts.map(p => (p(0), p(1), p(2))).toDF("a", "b", "c")
    val got = df.select(ZOrder.zorderKeyN(
        Seq($"a" -> 3, $"b" -> 2, $"c" -> 1)).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map(mortonN(_, budgets)))
    // (7,3,1) fills all 6 positions
    assert(got.head == 63L)
    // equal budgets reduce to the 2-ary strided key
    val two = Seq((170L, 85L), (3L, 9L)).toDF("x", "y")
    assert(
      two.select(ZOrder.zorderKeyN(Seq($"x" -> 8, $"y" -> 8))).as[Long].collect().toSeq ==
        two.select(ZOrder.zorderKey($"x", $"y", 8)).as[Long].collect().toSeq)
    // per-column range guard raises with the column index
    val e = intercept[Exception] {
      Seq((8L, 0L, 0L)).toDF("a", "b", "c")
        .select(ZOrder.zorderKeyN(Seq($"a" -> 3, $"b" -> 2, $"c" -> 1))).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("column 0")), e.toString)
    // budget-sum cap
    intercept[IllegalArgumentException] {
      ZOrder.zorderKeyN(Seq($"a" -> 31, $"b" -> 31, $"c" -> 2))
    }
    // randomized parity sweep vs the model, several budget shapes in
    // one Spark action
    val rnd = new scala.util.Random(31)
    val shapes = Seq(Seq(4, 4), Seq(5, 3, 2), Seq(1, 1, 1, 1), Seq(10, 2, 6, 1))
    val rows = (0 until 20).map { _ =>
      val vs = shapes.map(bs => bs.map(b => math.abs(rnd.nextLong()) % (1L << b)))
      (vs(0), vs(1), vs(2), vs(3))
    }
    val rdf = rows.toDF("v0", "v1", "v2", "v3")
    val keyed = rdf.select(shapes.zipWithIndex.map { case (bs, i) =>
      ZOrder.zorderKeyN(bs.zipWithIndex.map { case (b, j) =>
        element_at(col(s"v$i"), j + 1) -> b
      }).as(s"z$i")
    }: _*).collect()
    rows.zip(keyed).foreach { case ((a0, a1, a2, a3), got) =>
      Seq(a0, a1, a2, a3).zip(shapes).zipWithIndex.foreach {
        case ((vs, bs), i) =>
          assert(got.getLong(i) == mortonN(vs, bs), s"shape=$bs vs=$vs")
      }
    }
  }

  test("runningTotal matches a sequential scan regardless of bucket count") {
    val rnd = new scala.util.Random(7)
    val vals = (0L until 500L).map(i => (i, rnd.nextInt(100).toLong))
    val df = vals.toDF("id", "v")
    val expect = vals.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (id, v)) => (id, acc + v)
    }.tail.toMap
    for (buckets <- Seq(1, 7, 32)) {
      val got = Packing.runningTotal(df, col("v"), Seq(col("id")), "run", buckets)
        .select("id", "run").as[(Long, Long)].collect().toMap
      assert(got == expect, s"buckets=$buckets")
    }
  }

  test("assignBlocks: block spans follow the concatenated token stream") {
    val df = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 10L), (5L, 1L))
      .toDF("id", "n")
    val out = Packing.assignBlocks(df, col("n"), blockSize = 8, Seq(col("id")))
      .select("id", "start_token", "first_block", "last_block")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // stream: [0,3) [3,8) [8,12) [12,22) [22,23) with blocks of 8
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 3L, 0L, 0L), (3L, 8L, 1L, 1L),
      (4L, 12L, 1L, 2L), (5L, 22L, 2L, 2L)))
  }

  test("shuffledShards: exact shard sizes, a true permutation, deterministic") {
    val df = (0L until 333L).toDF("id")
    val out = Packing.shuffledShards(df, "id", shardRows = 50, seed = "x")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == 333)
    val byShard = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert((0L until 6L).forall(s => byShard(s) == 50) && byShard(6L) == 33,
      s"shard sizes $byShard")
    assert(out.map(_._1).distinct.length == 333, "every row exactly once")
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions are dense")
    }
    val again = Packing.shuffledShards(df, "id", 50, "x", buckets = 5)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "bucket count must not change the assignment")
  }

  test("writeShards round-trips through parquet partition dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (0L until 120L).toDF("id")
    Packing.writeShards(df, "id", shardRows = 50, seed = "w", path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 120)
    assert(back.select("shard").distinct().as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L))
    val direct = Packing.shuffledShards(df, "id", 50, "w")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val fromDisk = back.select("id", "shard").as[(Long, Long)].collect().toMap
    assert(fromDisk == direct)
  }

  // ----------------------------------------------------------- classify

  private lazy val embDf = {
    val rnd = new scala.util.Random(11)
    // three directionally separated gaussian clusters in 8d (a cluster
    // at the ORIGIN would have random cosine direction — orthogonal
    // centers keep both metrics separable)
    val centers = Array(
      Array(5f, 0f, 0f, 0f, 5f, 0f, 0f, 0f),
      Array(0f, 5f, 0f, 0f, 0f, 5f, 0f, 0f),
      Array(0f, 0f, 5f, 0f, 0f, 0f, 5f, 0f))
    (0 until 90).map { i =>
      val c = i % 3
      val v = centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.3f)
      (i.toLong, v, c)
    }.toDF("id", "vec", "lab")
  }

  test("classify recovers planted cluster labels via broadcast path") {
    val seeds = embDf.where($"id" < 30)
    val data = embDf.where($"id" >= 30)
    val out = KnnClassify.classify(
      data, "id", "vec", seeds, "id", "vec", "lab", k = 3)
    val wrong = out.join(embDf.select($"id", $"lab"), "id")
      .where($"label" =!= $"lab").count()
    assert(wrong == 0, "separated clusters must classify perfectly")
    assert(out.columns.toSeq == Seq("id", "label", "votes", "nn_id"))
    assert(out.where($"votes" === 3).count() == 60, "unanimous votes")
  }

  test("classify broadcast path matches classifyViaJoin exactly") {
    val seeds = embDf.where($"id" % 3 === 0)
      .select($"id", $"vec", ($"id" % 7).cast("int").as("lab")) // scrambled labels → tie cases
    val data = embDf.where($"id" % 3 =!= 0)
    for (metric <- Seq("cos", "l2sq")) {
      val a = KnnClassify.classify(
        data, "id", "vec", seeds, "id", "vec", "lab", k = 5, metric)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      val b = KnnClassify.classifyViaJoin(
        data, "id", "vec", seeds, "id", "vec", "lab", k = 5, metric)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, s"metric=$metric")
    }
  }

  test("classify handles k larger than the seed set and enforces the byte budget") {
    val seeds = embDf.where($"id" < 4)
    val out = KnnClassify.classify(
      embDf.where($"id" >= 4), "id", "vec", seeds, "id", "vec", "lab", k = 50)
    assert(out.count() == 86)
    val tight = spark.conf.get(graft.GraftConf.ClassifyBroadcastBytes, null)
    spark.conf.set(graft.GraftConf.ClassifyBroadcastBytes, "64")
    try {
      val e = intercept[IllegalArgumentException] {
        KnnClassify.classify(
          embDf, "id", "vec", embDf, "id", "vec", "lab", k = 3)
      }
      assert(e.getMessage.contains("broadcastBytes"))
    } finally {
      if (tight == null) spark.conf.unset(graft.GraftConf.ClassifyBroadcastBytes)
      else spark.conf.set(graft.GraftConf.ClassifyBroadcastBytes, tight)
    }
  }

  // -------------------------------------------------------------- vocab

  test("vocabulary: counts, rank order, cumulative coverage") {
    val df = Seq("a a a b b c", "a b d", null).toDF("text")
    val out = graft.text.CorpusStats.vocabulary(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // counts: a=4 b=3 c=1 d=1 of 9 total; ties by token asc
    assert(out.toSeq == Seq(
      ("a", 4L, 1L, math.rint(4.0 / 9 * 1e6) / 1e6),
      ("b", 3L, 2L, math.rint(7.0 / 9 * 1e6) / 1e6),
      ("c", 1L, 3L, math.rint(8.0 / 9 * 1e6) / 1e6)))
  }

  test("assignSplits: total partition, deterministic, near-nominal proportions") {
    import org.apache.spark.sql.functions._
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = ids.select($"id",
      Mixture.assignSplits($"id", "s1", splits).as("sp"))
    val counts = a.groupBy("sp").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test")) // total partition
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") - 1600L) < 100, counts.toString)
    // deterministic: identical on re-evaluation
    val b = ids.select($"id",
      Mixture.assignSplits($"id", "s1", splits).as("sp"))
    assert(a.collect().toSeq == b.collect().toSeq)
    // different seed shuffles membership
    val c = ids.select(Mixture.assignSplits($"id", "s2", splits).as("sp"))
    assert(a.select("sp").collect().toSeq != c.collect().toSeq)
    // bad weights refused
    intercept[IllegalArgumentException] {
      Mixture.assignSplits($"id", "s1", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }
}

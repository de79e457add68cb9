package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.WeightedSearch

/** Driver-checkable query for composite weighted search (SURVEY.md
  * §2.4). The second vector column is derived (reversed embedding) so
  * the multi-column shape is exercised on the single-vector test table;
  * the oracle derives it identically with list_reverse.
  */
object WeightedQueries {

  private def weightedKnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val q2 = q.reverse
    val df = e.where(col("vec_id") =!= 0)
      .withColumn("emb2", reverse(col("embedding")))
    WeightedSearch
      .exact(df,
        Seq(
          WeightedSearch.Term(0.7, "embedding", q),
          WeightedSearch.Term(0.3, "emb2", q2)),
        k = 10,
        tieBreak = Seq(col("vec_id")))
      .select(col("vec_id"), round(col("joint_dist"), 4).as("dist"))
  }

  private val oracle: String = {
    def l2sq(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
    val joint =
      s"0.7 * ${l2sq("e.embedding", "qr.q")} + 0.3 * ${l2sq("list_reverse(e.embedding)", "list_reverse(qr.q)")}"
    s"""SELECT e.vec_id, round($joint, 4) AS dist
       |FROM embeddings e, (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) qr
       |WHERE e.vec_id <> 0
       |ORDER BY $joint, e.vec_id
       |LIMIT 10""".stripMargin
  }

  /** ANN variant of the weighted search (sql/lantern.sql:673-819:
    * per-column ANN → UNION ALL → DISTINCT ON(id) → joint re-sort):
    * each column's index contributes `ef` candidates and the
    * joint-metric re-rank must reach recall@10 ≥ 0.8 vs the exact
    * weighted top-10 — the same contract as `knn_ann_recall`, per
    * search column. */
  /** Weighted query pairs for the multi-query protocol: each sample
    * vector contributes (q, reverse(q)) — a joint metric is a per-pair
    * construct, so these gates loop a small sample (each iteration is
    * TWO index probes + a joint re-rank) while the per-kind 50-query
    * graph-quality evidence lives in the AnnQueries searchMany gates. */
  private val WeightedSample = 5

  private def weightedSamples(e: DataFrame): Seq[(Long, Array[Float])] =
    e.orderBy(col("vec_id")).limit(WeightedSample)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  private def weightedKnnAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnIndex, AnnParams}
    val e = Tables.embeddings(s, dir)
    val df = e.withColumn("emb2", reverse(col("embedding")))
    val p1 = AnnQueries.artifactDir("ann", dir, "embeddings")
    AnnQueries.cached(p1) {
      AnnIndex.build(e, "vec_id", "embedding", p1,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val p2 = AnnQueries.artifactDir("annw2full", dir, "embeddings")
    AnnQueries.cached(p2) {
      AnnIndex.build(df, "vec_id", "emb2", p2,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    // multi-query: WeightedSample (q, reverse q) pairs, each through
    // the per-column-ANN → union → joint re-rank path vs its exact
    // weighted top-10 — micro-averaged recall ≥ 0.8
    val probes = RecallProtocol.probed(weightedSamples(e)) { case (_, q) =>
      val q2 = q.reverse
      val terms = Seq(
        WeightedSearch.Term(0.7, "embedding", q),
        WeightedSearch.Term(0.3, "emb2", q2))
      val ann = WeightedSearch
        .ann(s, df, "vec_id", Seq(terms(0) -> p1, terms(1) -> p2), k = 10, ef = 64)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = WeightedSearch
        .exact(df, terms, 10, tieBreak = Seq(col("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (ann.intersect(exact).size, exact.size)
    }
    val hits = probes.map(_._1).sum
    val total = probes.map(_._2).sum
    if (hits.toDouble >= 0.8 * total) Seq(1).toDF("ok")
    else Seq.empty[Int].toDF("ok")
  }

  /** Planner-level weighted search: the SQL/DataFrame form
    * `ORDER BY 0.7·l2sq_dist(emb,q) + 0.3·cos_dist(emb,q2) LIMIT 10`
    * must (a) optimize into [[graft.plans.WeightedAnnIdsLogical]] (the
    * per-term index union + joint-metric re-rank,
    * sql/lantern.sql:673-819's plan shape), and (b) reach recall@10 ≥
    * 0.8 vs the exact weighted top-10. Two metrics over one physical
    * column exercise two separately-registered indexes on one table. */
  private def weightedKnnPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnIndex, AnnParams}
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val p1 = AnnQueries.artifactDir("ann", dir, "embeddings")
    AnnQueries.cached(p1) {
      AnnIndex.build(e, "vec_id", "embedding", p1,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val pCos = AnnQueries.artifactDir("anncosw", dir, "embeddings")
    AnnQueries.cached(pCos) {
      AnnIndex.build(e, "vec_id", "embedding", pCos,
        AnnParams(m = 16, efConstruction = 128, ef = 64,
          metric = "cos", numPartitions = 4))
    }
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(p1, "vec_id", "embedding", "l2sq", ef = 64))
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(pCos, "vec_id", "embedding", "cos", ef = 64))
    try {
      // multi-query: WeightedSample (q, q2) pairs — q2 is the NEXT
      // sample vector (two distinct literal queries per joint metric);
      // EVERY pair's plan must rewrite, micro recall ≥ 0.8
      val qs = weightedSamples(e)
      val probes = RecallProtocol.probed(qs.indices) { i =>
        val q = qs(i)._2
        val q2 = qs((i + 1) % qs.size)._2
        val joint = lit(0.7) * graft.functions.l2sq_dist(col("embedding"), lit(q)) +
          lit(0.3) * graft.functions.cos_dist(col("embedding"), lit(q2))
        val knn = e.orderBy(joint).limit(10)
        val planned = knn.queryExecution.optimizedPlan.collect {
          case w: graft.plans.WeightedAnnIdsLogical => w
        }.nonEmpty
        val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
        val exact = e.withColumn("d", joint)
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (planned, got.intersect(exact).size, exact.size)
      }
      val allPlanned = probes.forall(_._1)
      val hits = probes.map(_._2).sum
      val total = probes.map(_._3).sum
      if (allPlanned && hits.toDouble >= 0.8 * total) Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Planner-level weighted search under `max_dist` (the ONE predicate
    * the reference's `weighted_vector_search` accepts,
    * sql/lantern.sql:673-819): `WHERE joint < md ORDER BY joint LIMIT k`
    * must still route through [[graft.plans.WeightedAnnIdsLogical]] —
    * the Filter re-applies above the join-back — while any OTHER
    * predicate keeps the exact plan. Gated on: plan shape for the
    * max_dist form, exact-plan for a general predicate, every returned
    * row actually under md, and recall@10 ≥ 0.8 vs the exact filtered
    * top-10. */
  private def weightedKnnMaxdistPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnIndex, AnnParams}
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val p1 = AnnQueries.artifactDir("ann", dir, "embeddings")
    AnnQueries.cached(p1) {
      AnnIndex.build(e, "vec_id", "embedding", p1,
        AnnParams(m = 16, efConstruction = 128, ef = 64, numPartitions = 4))
    }
    val pCos = AnnQueries.artifactDir("anncosw", dir, "embeddings")
    AnnQueries.cached(pCos) {
      AnnIndex.build(e, "vec_id", "embedding", pCos,
        AnnParams(m = 16, efConstruction = 128, ef = 64,
          metric = "cos", numPartitions = 4))
    }
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(p1, "vec_id", "embedding", "l2sq", ef = 64))
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(pCos, "vec_id", "embedding", "cos", ef = 64))
    try {
      def planned(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case w: graft.plans.WeightedAnnIdsLogical => w
        }.nonEmpty
      // multi-query: 3 (q, q2) pairs (each pair pays an md probe + an
      // allUnder audit on top of the search), micro recall ≥ 0.8,
      // EVERY max_dist plan must rewrite
      val qs = weightedSamples(e).take(3)
      val probes = RecallProtocol.probed(qs.indices) { i =>
        val q = qs(i)._2
        val q2 = qs((i + 1) % qs.size)._2
        def joint = lit(0.7) * graft.functions.l2sq_dist(col("embedding"), lit(q)) +
          lit(0.3) * graft.functions.cos_dist(col("embedding"), lit(q2))
        // md = the 20th smallest joint distance: ~19 rows pass, so the
        // filter genuinely cuts while the LIMIT 10 stays satisfiable
        val md = e.withColumn("d", joint).orderBy(col("d"))
          .limit(20).agg(max(col("d"))).head().getDouble(0)
        val knn = e.where(joint < md).orderBy(joint).limit(10)
        val plannedOk = planned(knn)
        val gotIds = knn.select("vec_id").collect().map(_.getLong(0)).toSet
        val exact = e.withColumn("d", joint).where(col("d") < md)
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val under = e.withColumn("d", joint)
          .where(col("vec_id").isin(gotIds.toSeq: _*))
          .select("d").collect().forall(_.getDouble(0) < md)
        // a general predicate must NOT fire the weighted rewrite
        val generalExact = i != 0 || !planned(
          e.where(col("vec_id") % 3 === 0).orderBy(joint).limit(10))
        (plannedOk, gotIds.intersect(exact).size, exact.size, under,
          generalExact)
      }
      val allPlanned = probes.forall(_._1)
      val hits = probes.map(_._2).sum
      val total = probes.map(_._3).sum
      val allUnder = probes.forall(_._4)
      val generalStaysExact = probes.forall(_._5)
      if (allPlanned && generalStaysExact && allUnder &&
          hits.toDouble >= 0.8 * total)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  /** Mixed-kind weighted planner: one joint sort whose terms are
    * backed by DIFFERENT index kinds — the l2sq term by a bq (sign-
    * bit) index, the cos term by an hnsw graph. The rewrite must still
    * fire ([[graft.plans.WeightedAnnIdsLogical]]), each term's
    * candidates must come from its OWN kind's proposal function (the
    * captured terms name both kinds), and the joint re-rank must hold
    * recall@10 ≥ 0.8 vs the exact weighted top-10. */
  private def weightedKnnMixedPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ann.{AnnIndex, AnnParams}
    import graft.plans.AnnCatalog
    val e = Tables.embeddings(s, dir)
    val pBq = AnnQueries.artifactDir("bqp", dir, "embeddings")
    AnnQueries.cached(pBq) {
      graft.ann.BqIndex.build(e, "vec_id", "embedding", pBq)
    }
    val pCos = AnnQueries.artifactDir("anncosw", dir, "embeddings")
    AnnQueries.cached(pCos) {
      AnnIndex.build(e, "vec_id", "embedding", pCos,
        AnnParams(m = 16, efConstruction = 128, ef = 64,
          metric = "cos", numPartitions = 4))
    }
    val tablePath = s"$dir/embeddings.parquet"
    AnnCatalog.register(s, tablePath, AnnCatalog.IndexMeta(
      pBq, "vec_id", "embedding", "l2sq", ef = 384, kind = "bq"))
    AnnCatalog.register(s, tablePath,
      AnnCatalog.IndexMeta(pCos, "vec_id", "embedding", "cos", ef = 64))
    try {
      val qs = weightedSamples(e)
      val probes = RecallProtocol.probed(qs.indices) { i =>
        val q = qs(i)._2
        val q2 = qs((i + 1) % qs.size)._2
        val joint = lit(0.7) * graft.functions.l2sq_dist(col("embedding"), lit(q)) +
          lit(0.3) * graft.functions.cos_dist(col("embedding"), lit(q2))
        val knn = e.orderBy(joint).limit(10)
        val ws = knn.queryExecution.optimizedPlan.collect {
          case w: graft.plans.WeightedAnnIdsLogical => w
        }
        val kinds = ws.headOption.exists(
          _.terms.map(_.kind).toSet == Set("bq", "hnsw"))
        val got = knn.select("vec_id").collect().map(_.getLong(0)).toSet
        val exact = e.withColumn("d", joint)
          .orderBy(col("d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (ws.nonEmpty, kinds, got.intersect(exact).size, exact.size)
      }
      val allPlanned = probes.forall(_._1)
      val kindsOk = probes.forall(_._2)
      val hits = probes.map(_._3).sum
      val total = probes.map(_._4).sum
      if (allPlanned && kindsOk && hits.toDouble >= 0.8 * total)
        Seq(1).toDF("ok")
      else Seq.empty[Int].toDF("ok")
    } finally AnnCatalog.unregister(s, tablePath)
  }

  // ------------------------------------------------------------- MMR

  private val mmrK = 5
  private val mmrLambda = 0.7
  private val mmrFetch = 20

  /** Diversity re-rank: exact top-20 by cosine similarity to vec 0's
    * embedding, greedily reduced to the 5 MMR winners (λ = 0.7). The
    * oracle replays the EXACT greedy — a recursive CTE carrying the
    * picked list, one argmax per step with the same double arithmetic
    * and (score desc, id) tie-break. */
  private def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    graft.ops.MmrRerank.rerank(
      e.where(col("vec_id") =!= 0), "vec_id", "embedding",
      q, k = mmrK, lambda = mmrLambda, fetchN = mmrFetch)
  }

  private val mmrOracle: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    def norm(c: String) =
      s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    def cosSim(a: String, b: String) =
      s"(${dot(a, b)} / (${norm(a)} * ${norm(b)}))"
    s"""WITH RECURSIVE
       |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
       |cand0 AS (
       |  SELECT e.vec_id AS id, ${cosSim("e.embedding", "qv.q")} AS rel, e.embedding
       |  FROM embeddings e, qv WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, id LIMIT $mmrFetch),
       |pair AS (
       |  SELECT a.id AS ia, b.id AS ib, ${cosSim("a.embedding", "b.embedding")} AS sim
       |  FROM cand0 a, cand0 b WHERE a.id <> b.id),
       |sel AS (
       |  SELECT 0 AS step, CAST([] AS BIGINT[]) AS picked
       |  UNION ALL
       |  SELECT s.step + 1,
       |    list_append(s.picked, (
       |      SELECT c.id FROM cand0 c
       |      WHERE NOT list_contains(s.picked, c.id)
       |      ORDER BY $mmrLambda * c.rel - ${1.0 - mmrLambda} * coalesce(
       |        (SELECT max(p.sim) FROM pair p
       |         WHERE p.ia = c.id AND list_contains(s.picked, p.ib)), 0.0) DESC,
       |        c.id
       |      LIMIT 1))
       |  FROM sel s WHERE s.step < $mmrK)
       |SELECT CAST(j AS BIGINT) AS rank, f.picked[CAST(j AS INT)] AS id,
       |  round(c.rel, 4) AS rel
       |FROM (SELECT picked FROM sel WHERE step = $mmrK) f,
       |     unnest(range(1, ${mmrK + 1})) AS r(j)
       |     JOIN cand0 c ON c.id = f.picked[CAST(j AS INT)]
       |ORDER BY rank""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("weighted_knn_exact", Some(oracle), weightedKnn),
    QueryDef("weighted_knn_ann", Some("SELECT 1 AS ok"), weightedKnnAnn),
    QueryDef("weighted_knn_planner", Some("SELECT 1 AS ok"), weightedKnnPlanner),
    QueryDef("weighted_knn_maxdist_planner", Some("SELECT 1 AS ok"),
      weightedKnnMaxdistPlanner),
    QueryDef("weighted_knn_mixed_planner", Some("SELECT 1 AS ok"),
      weightedKnnMixedPlanner),
    QueryDef("mmr_rerank", Some(mmrOracle), mmrRerank),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VecFiles

/** Driver-checkable query for the `.fvecs` reader (SURVEY.md §2.5,
  * parse_fvecs). A deterministic fixture file is written to the local
  * tmp dir, read back through the distributed reader, and compared to
  * a literal VALUES oracle.
  */
object SourceQueries {

  private val N = 20

  private def fixtureVec(i: Int): Array[Float] =
    Array(i.toFloat, i + 0.25f, 2f * i, -(i + 1).toFloat)

  private def parseFvecs(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), "graft-fixture.fvecs").toString
    VecFiles.writeFvecs(path, (0 until N).map(fixtureVec))
    VecFiles.readFvecs(s, path)
      .select(
        col("id"),
        element_at(col("vec"), 1).cast("double").as("v0"),
        element_at(col("vec"), 2).cast("double").as("v1"),
        element_at(col("vec"), 3).cast("double").as("v2"),
        element_at(col("vec"), 4).cast("double").as("v3"))
      .orderBy("id")
  }

  private val oracle: String = {
    val rows = (0 until N).map { i =>
      val v = fixtureVec(i)
      s"(CAST($i AS BIGINT), " + v.map(x => s"CAST($x AS DOUBLE)").mkString(", ") + ")"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(id, v0, v1, v2, v3) ORDER BY id"
  }

  /** JSONL roundtrip over the documents table: export to JSON-lines,
    * re-ingest with the explicit schema, and emit the full table — the
    * oracle is the identity select, so any escaping/encoding loss in
    * either direction breaks the hash. Newlines and quotes in `text`
    * are exercised by the corpus itself. */
  private def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.CorpusIo
    val docs = graft.Tables.documents(s, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString
    CorpusIo.writeJsonl(docs, path)
    CorpusIo.readJsonl(s, path, docs.schema)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  private val jsonlOracle =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** CSV roundtrip over the embeddings table with the vector encoded
    * as a space-joined cell (Float.toString is shortest-round-trip, so
    * decode is bit-exact). The emitted norm is recomputed from the
    * DECODED floats; the oracle recomputes it from the original
    * parquet — equality proves the floats survived text encoding. */
  private def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.CorpusIo
    val e = graft.Tables.embeddings(s, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft-csv").toString
    CorpusIo.writeCsv(
      e.select(col("vec_id"), col("label"),
        CorpusIo.vecToText(col("embedding")).as("vec")), path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, label INT, vec STRING")
    CorpusIo.readCsv(s, path, schema)
      .select(col("vec_id"), col("label"),
        CorpusIo.textToVec(col("vec")).as("embedding"))
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        (floor(graft.functions.vector_norm(col("embedding")) * 1e4 + 0.5)
          / 1e4).as("norm"))
      .orderBy("vec_id")
  }

  private val csvOracle =
    """SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
      |  floor(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1e4 + 0.5) / 1e4
      |    AS norm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Bucketed co-located join: both sides written `bucketBy(8,
    * vec_id)`, so the join plans WITHOUT any Exchange — the
    * pre-partitioning that turns a repeated 100 TB join key into a
    * one-time write-side cost. The gate asserts the shuffle-free plan
    * (broadcast disabled so the bucketed path is actually exercised)
    * AND the joined values; rows emit only when both hold. */
  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.vector_norm
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val (t1, t2) = (s"graft_bl_$tag", s"graft_br_$tag")
    val e = graft.Tables.embeddings(s, dir)
    e.select("vec_id", "label").write
      .bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable(t1)
    e.select(col("vec_id"),
      (floor(vector_norm(col("embedding")) * 1e4 + 0.5) / 1e4).as("norm"))
      .write.bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable(t2)
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val oldBcast = s.conf.get(bcastKey)
    try {
      s.conf.set(bcastKey, "-1")
      val joined = s.table(t1).join(s.table(t2), "vec_id")
        .groupBy(col("label"))
        .agg(count(lit(1)).cast("int").as("n"),
          round(sum(col("norm")), 4).as("sum_norm"))
        .orderBy("label")
      val shuffleFree = !joined.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning(vec_id")
      // materialize BEFORE the tables drop — the returned frame must
      // not hold a lazy scan of them
      val rows = if (shuffleFree) joined.collect() else Array.empty[Row]
      s.createDataFrame(
        java.util.Arrays.asList(rows: _*), joined.schema).orderBy("label")
    } finally {
      s.conf.set(bcastKey, oldBcast)
      s.sql(s"DROP TABLE IF EXISTS $t1")
      s.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  private val bucketedJoinOracle =
    """SELECT label, CAST(count(*) AS INT) AS n,
      |  round(sum(floor(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1e4 + 0.5) / 1e4), 4)
      |    AS sum_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  /** Salted skew join: events (skewed fact side) join a per-user
    * aggregate through `SkewJoin.saltedJoin(salts = 8)` — hot keys
    * split 8-way instead of pinning one reducer. The gate asserts the
    * salted PLAN SHAPE (a Generate/explode feeding the join, keys
    * widened by the salt, broadcast disabled so the shuffle path is
    * the one exercised) and the aggregate must hash-match the plain
    * SQL join — salting must change the partitioning, never the
    * result. */
  private def skewJoin(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
    val perUser = e.groupBy("user_id")
      .agg(sum(col("cents")).as("user_cents"))
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val oldBcast = s.conf.get(bcastKey)
    try {
      s.conf.set(bcastKey, "-1")
      val joined = graft.ops.SkewJoin.saltedJoin(
          e, perUser, "user_id", col("event_id"), salts = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("int").as("n"),
          sum(col("cents")).as("cents"),
          sum(col("user_cents")).as("user_cents"))
        .orderBy("event_type")
      val plan = joined.queryExecution.executedPlan.toString
      val salted = plan.contains("Generate explode") &&
        plan.contains("__salt")
      val rows = if (salted) joined.collect() else Array.empty[Row]
      s.createDataFrame(
        java.util.Arrays.asList(rows: _*), joined.schema).orderBy("event_type")
    } finally s.conf.set(bcastKey, oldBcast)
  }

  private val skewJoinOracle =
    """WITH e AS (
      |  SELECT event_type, user_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), u AS (
      |  SELECT user_id, sum(cents) AS user_cents FROM e GROUP BY user_id
      |)
      |SELECT e.event_type, CAST(count(*) AS INT) AS n,
      |  CAST(sum(e.cents) AS BIGINT) AS cents,
      |  CAST(sum(u.user_cents) AS BIGINT) AS user_cents
      |FROM e JOIN u USING (user_id)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("parse_fvecs", Some(oracle), parseFvecs),
    QueryDef("jsonl_roundtrip", Some(jsonlOracle), jsonlRoundtrip),
    QueryDef("csv_roundtrip", Some(csvOracle), csvRoundtrip),
    QueryDef("bucketed_join", Some(bucketedJoinOracle), bucketedJoin),
    QueryDef("skew_join", Some(skewJoinOracle), skewJoin),
  )
}

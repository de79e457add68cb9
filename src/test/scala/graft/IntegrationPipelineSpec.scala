package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.ann.{AnnIndex, AnnParams}
import graft.embed.{EmbeddingPipeline, HashEmbeddingRuntime}
import graft.functions._
import graft.ops.Dedup
import graft.plans.AnnCatalog
import graft.text.{Bm25, TextAnalysis}

/** The whole training-data pipeline composed end-to-end from the
  * library's operators: clean → dedup → quality filter → embed →
  * index → search (+ BM25 retrieval over the same corpus). What a
  * lantern user's ingestion DAG looks like on this engine.
  */
class IntegrationPipelineSpec extends SparkTestBase {

  test("documents → dedup → quality filter → embed → ANN index → search") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val n0 = docs.count()

    // 1. exact dedup (keep min doc_id per identical text)
    val deduped = Dedup.exactDedup(docs, "doc_id", Seq("text"))
    val n1 = deduped.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. quality + language filters (map-side column ops)
    val filtered = deduped
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .withColumn("lang_guess", TextAnalysis.languageId(col("text")))
      .where(col("q") > 0.2)
    val n2 = filtered.count()
    assert(n2 > 0 && n2 <= n1)

    // 3. embedding generation with failed-row side output
    val rt = new HashEmbeddingRuntime()
    val embedded = EmbeddingPipeline.createEmbeddings(
      filtered.select("doc_id", "text"), "text", rt, "mock/tiny")
    val ok = EmbeddingPipeline.embeddedRows(embedded)
    assert(ok.count() === n2, "no failures expected on non-empty docs")

    // 4. ANN index over the generated embeddings
    val tmp = Files.createTempDirectory("graft-e2e").toString
    val vecs = ok.select(col("doc_id"),
      col(EmbeddingPipeline.EmbeddingCol).as("vec"))
    AnnIndex.build(vecs, "doc_id", "vec", s"$tmp/idx",
      AnnParams(m = 8, numPartitions = 2))

    // 5. search: a document's own embedding must find it at distance 0
    val probe = filtered.select("doc_id", "text").head()
    val qv = HashEmbeddingRuntime.embed(probe.getString(1), 8)
    val hit = AnnIndex.search(spark, s"$tmp/idx", qv, 1).head
    assert(hit._2 === 0.0)

    // 6. BM25 retrieval over the same filtered corpus
    val analyzed = filtered.select(col("doc_id"),
      text_to_stem_array(col("text")).as("terms"))
    val inv = Bm25.createBm25Table(analyzed, "doc_id", "terms")
    // query with the doc's most distinctive (longest) tokens — leading
    // words are often stopwords with near-zero idf
    val queryText = probe.getString(1).toLowerCase
      .split("[^a-z0-9]+").filter(_.nonEmpty)
      .distinct.sortBy(-_.length).take(3).mkString(" ")
    val top = Bm25.searchText(filtered, "doc_id", "text", queryText,
      limit = 5, prebuilt = Some(inv))
    assert(top.count() === 5)
    // ranking on synthetic text is corpus-dependent; the robust
    // property is retrieval: the probe doc must be matched by its own
    // terms with a positive score somewhere in the full result
    val all = Bm25.searchText(filtered, "doc_id", "text", queryText,
      limit = n2.toInt, prebuilt = Some(inv))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(all.get(probe.getLong(0)).exists(_ > 0.0),
      s"probe doc ${probe.getLong(0)} not retrieved by its own terms")
  }
}

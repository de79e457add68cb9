package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Multinomial Naive Bayes over hashed word uni+bigram features — the
  * deterministic, closed-form analog of the fasttext-style linear
  * classifiers used for corpus domain/quality filtering (CCNet's LM
  * filtering, GPT-3's WebText-vs-CommonCrawl quality classifier):
  * `score(c|x) = log P(c) + Σ_f c_f(x)·log P̂(f|c)` with add-α
  * smoothing over a `buckets`-bounded feature space, prediction =
  * argmax (ties → lexicographically-first class).
  *
  * Training is closed-form counting — no iterative optimizer — so fit
  * + predict replay exactly in ANSI SQL for the oracle gate, unlike an
  * L-BFGS logistic regression whose float trajectory is not portable.
  *
  * Scale shape: fitting is ONE explode into a `classes × buckets`-
  * bounded aggregate (map-side combine); the model is a few doubles
  * per class-bucket, broadcast once; scoring is one codegen'd
  * [[DsirScore]] pass per class per doc (classes are few) — no joins,
  * no shuffles in the predict job.
  */
object NbClassifier {

  /** Fitted model: `classes` sorted ascending; `logProb(i)(f)` =
    * log P̂(f | classes(i)); `logPrior(i)` = log P(classes(i)). */
  case class NbModel(
      classes: Array[String],
      logPrior: Array[Double],
      logProb: Array[Array[Double]],
      buckets: Int)

  val MaxClasses = 256

  def fit(
      docs: DataFrame,
      labelCol: String,
      textCol: String,
      buckets: Int = 4096,
      alpha: Double = 0.5): NbModel = {
    val d = docs.where(col(textCol).isNotNull && col(labelCol).isNotNull)

    val priorRows = d.groupBy(labelCol).agg(count(lit(1)).as("n")).collect()
    require(priorRows.length <= MaxClasses,
      s"graft: NB fit saw ${priorRows.length} classes (max $MaxClasses) — " +
        "a high-cardinality label column is probably a mistake")
    val classes = priorRows.map(_.getString(0)).sorted
    val idx = classes.zipWithIndex.toMap
    val nDocs = priorRows.map(_.getLong(1)).sum.toDouble
    val logPrior = new Array[Double](classes.length)
    priorRows.foreach { r =>
      logPrior(idx(r.getString(0))) = math.log(r.getLong(1) / nDocs)
    }

    // classes × buckets bounded: the whole count table collects
    val cc = d
      .select(col(labelCol).as("__c"),
        explode(Dsir.hashedGrams(col(textCol), buckets)).as("bucket"))
      .groupBy("__c", "bucket").agg(count(lit(1)).as("cnt"))
      .collect()
    val counts = Array.fill(classes.length)(new Array[Long](buckets))
    val totals = new Array[Long](classes.length)
    cc.foreach { r =>
      val i = idx(r.getString(0))
      counts(i)(r.getInt(1)) = r.getLong(2)
      totals(i) += r.getLong(2)
    }
    val logProb = Array.tabulate(classes.length) { i =>
      val arr = new Array[Double](buckets)
      var f = 0
      while (f < buckets) {
        arr(f) = math.log((counts(i)(f) + alpha) / (totals(i) + alpha * buckets))
        f += 1
      }
      arr
    }
    NbModel(classes, logPrior, logProb, buckets)
  }

  /** Predicted class + log-score per doc: `(idCol, pred, score)`.
    * Null-text docs are excluded; token-free docs get the prior-only
    * argmax. */
  def predict(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val scored: Seq[Column] = model.classes.indices.map { i =>
      val bc = sc.broadcast(model.logProb(i))
      (GraftSqlShim.column(DsirScore(
        GraftSqlShim.expression(col(textCol)), bc, model.buckets))
        + model.logPrior(i)).as(s"__s$i")
    }
    // argmax with ties → smallest class index: max over (score, -idx)
    val best = array_max(array(model.classes.indices.map(i =>
      struct(col(s"__s$i").as("s"), lit(-i).as("ni"))): _*))
    val classArr = array(model.classes.map(lit(_)): _*)
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol) +: scored: _*)
      .withColumn("__best", best)
      .select(col(idCol),
        element_at(classArr, -col("__best.ni") + 1).as("pred"),
        col("__best.s").as("score"))
  }
}

package graft.text

import org.apache.spark.sql.SparkSession

/** User stopword persistence — `set_user_stopwords` /
  * `get_user_stopwords` (lantern_extras/src/stemmers.rs:24-93). The
  * reference persists per-database GUC state; the Spark analog is
  * session conf (survives the session, ships to executors with every
  * closure that reads it at plan time).
  */
object Stopwords {
  val ConfKey = "spark.graft.text.userStopwords"

  def setUserStopwords(spark: SparkSession, words: Seq[String]): Unit =
    spark.conf.set(ConfKey, words.map(_.trim.toLowerCase).filter(_.nonEmpty)
      .mkString(","))

  def getUserStopwords(spark: SparkSession): Seq[String] =
    spark.conf.getOption(ConfKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** Default English list plus the session's user list — what the
    * analyzer actually applies. */
  def effective(spark: SparkSession): Seq[String] =
    (PorterStemmer.defaultStopwords ++ getUserStopwords(spark)).toSeq
}

package graft.ops

import org.apache.spark.sql.DataFrame

/** `lantern.masked_explain` analog (lantern_hnsw/sql/lantern.sql:
  * 888-915, maskers :599-654): plan text with inline vector literals
  * collapsed to `<vector(n)>` so plan-shape assertions (and humans)
  * aren't drowned in 2000-float arrays. Works on any of Spark's
  * explain modes.
  */
object MaskedExplain {

  private val FloatArray =
    """\[(-?\d+(?:\.\d+)?(?:[Ee]-?\d+)?(?:,\s*-?\d+(?:\.\d+)?(?:[Ee]-?\d+)?){3,})(?:,\s*\.\.\.\s*\d*\s*more\s*fields?)?\]""".r

  /** Mask vector literals in an arbitrary plan/exploded string. */
  def mask(planText: String): String =
    FloatArray.replaceAllIn(planText, m => {
      val n = m.group(1).count(_ == ',') + 1
      java.util.regex.Matcher.quoteReplacement(s"<vector($n)>")
    })

  /** Masked formatted plan of a DataFrame. */
  def explain(df: DataFrame, mode: String = "formatted"): String = {
    val qe = df.queryExecution
    val text = mode match {
      case "formatted" => qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      case m => qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString(m))
    }
    mask(text)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dev tool: run a SUBSET of SparkEntry.queries against one sf dir and
  * dump results + their oracle SQL in the same layout Verify uses, so
  * `tools/check_correctness.py <sfDir> <outDir>` can gate just those
  * queries. Usage: runMain graft.tools.RunOne <sfDir> <outDir> <name>...
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the sf test files are a few MB — at the default 128 MB
      // maxPartitionBytes they scan as 1-3 partitions and every
      // map-side operator serializes onto one core; small splits
      // restore full parallelism (real deployments size this knob to
      // executor memory instead)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter { case (n, _) => names(n) }
    require(selected.nonEmpty, s"no queries matched: $names")
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // mirrors Verify: materialize in parallel, then single-file write
      fn(spark, sfDir).localCheckpoint().coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[runone] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => names(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

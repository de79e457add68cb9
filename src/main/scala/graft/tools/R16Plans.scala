package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` of named SparkEntry queries to
  * plans/r16/<query>_<suffix>.txt — the optimization round's committed
  * plan evidence. For gates whose result is a constant ok-row the
  * returned plan is tiny by design; the files still prove the round's
  * claim for them (plan shape UNCHANGED — the optimization is job
  * scheduling, not plan surgery). Usage:
  *   runMain graft.tools.R16Plans <sfDir> <suffix> <query>...
  */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("plans/r16").mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = graft.ops.MaskedExplain.explain(df, "formatted")
      Files.writeString(
        Paths.get(s"plans/r16/${name}_$suffix.txt"), txt)
      println(s"[r16plans] wrote plans/r16/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

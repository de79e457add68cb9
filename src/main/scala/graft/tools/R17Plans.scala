package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` of named SparkEntry queries to
  * plans/r17/<query>_<suffix>.txt — the optimization round's committed
  * plan evidence. Per the r16 verdict, gate-level dumps of constant
  * ok-row gates prove little; the meaningful r17 evidence is the INNER
  * serving-form dumps (see R17Inner) — this tool covers the queries
  * whose RETURNED frame is the optimized dataflow. Usage:
  *   runMain graft.tools.R17Plans <sfDir> <suffix> <query>...
  */
object R17Plans {
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
    new java.io.File("plans/r17").mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = graft.ops.MaskedExplain.explain(df, "formatted")
      Files.writeString(
        Paths.get(s"plans/r17/${name}_$suffix.txt"), txt)
      println(s"[r17plans] wrote plans/r17/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

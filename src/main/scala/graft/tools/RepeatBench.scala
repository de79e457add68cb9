package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run selected SparkEntry queries N times each in ONE JVM
  * (Bench's session config) and print per-iteration wall times — for
  * separating plan cost from JVM/host noise (GC, JIT, host steal).
  * Usage: runMain graft.tools.RepeatBench <sfDir> <reps> <name>...
  */
object RepeatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis: Long = {
      var t = 0L; gcBeans.forEach(b => t += b.getCollectionTime); t
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until reps).foreach { i =>
        val g0 = gcMillis
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[repeat] $name#$i $dt%.2fs gc=${gcMillis - g0}ms")
      }
    }
    spark.stop()
  }
}

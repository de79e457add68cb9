package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table, then run EVERY query once at the
    // smallest sf — whole-stage codegen compiles per plan shape, so
    // without this the first measured query of each shape absorbs
    // several seconds of JIT that has nothing to do with the data scale
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => try Tables.read(spark, sfDir, t).count()
      catch { case _: Throwable => })
    val warmSf = "/root/testdata/sf0.001"
    if (new java.io.File(warmSf).isDirectory && warmSf != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmSf).queryExecution.toRdd.foreach(_ => ())
        catch { case _: Throwable => }
      }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // a failed query is REPORTED, never masked: per-query status in the
    // JSON, a "failed" list, and a nonzero exit code
    //
    // Each query runs `reps` times and reports the MINIMUM: measured
    // single-shot times on this host vary up to 8× run-to-run (tiered
    // JIT still compiling the codegen'd kernels + virtualized-host
    // noise — verified with tools/RepeatBench: identical plans went
    // 86s → 9.9s over five reps with <2s of GC). Min-of-N is the
    // standard steady-state estimator; the plan is still evaluated in
    // FULL each rep (toRdd.foreach, not count(): count lets Catalyst
    // prune every projected column, so map-heavy queries would measure
    // a row count instead of their actual compute).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val results = SparkEntry.queries.map { case (name, fn) =>
      var best = Double.MaxValue
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case t: Throwable =>
          System.err.println(s"[bench] FAILED $name: ${t.getClass.getName}: ${t.getMessage}")
          err = Some(t.getClass.getSimpleName)
        }
        r += 1
      }
      (name, if (err.isEmpty) best else 0.0, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}

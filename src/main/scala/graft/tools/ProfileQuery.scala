package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev profiler: run selected SparkEntry queries under a job listener
  * and print every Spark JOB's wall time + description/callsite, plus
  * the driver-side gaps between jobs — separates "many small actions"
  * overhead from genuinely expensive distributed work. Usage:
  * runMain graft.tools.ProfileQuery <sfDir> <reps> <name>...
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPENCOST", "64k"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long, desc: String,
        nTasks: Int)
    val jobs = new ConcurrentLinkedQueue[Job]()
    val open = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val j = Job(js.jobId, js.time, 0L, desc,
          js.stageInfos.map(_.numTasks).sum)
        open.put(js.jobId, j)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = open.remove(je.jobId)
        if (j != null) { j.end = je.time; jobs.add(j) }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until reps).foreach { i =>
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val dt = (System.nanoTime() - t0) / 1e9
        // give the async listener bus a moment to drain
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toList.sortBy(_.start)
        val jobSum = js.map(j => j.end - j.start).sum / 1e3
        println(f"[prof] === $name#$i total=$dt%.2fs jobs=${js.size} " +
          f"jobTime=$jobSum%.2fs driverGap=${dt - jobSum}%.2fs")
        if (i == reps - 1) {
          var prevEnd = 0L
          js.foreach { j =>
            val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
            prevEnd = math.max(prevEnd, j.end)
            println(f"[prof]   job ${j.id}%4d ${(j.end - j.start) / 1e3}%6.2fs " +
              f"gapBefore=$gap%5.2fs tasks=${j.nTasks}%3d  ${j.desc.take(110)}")
          }
        }
      }
    }
    spark.stop()
  }
}

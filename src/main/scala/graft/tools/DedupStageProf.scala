package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch profiler: stage-by-stage timings of the minhash keepers
  * pipeline on the DedupScaleProbe's derived corpus. */
object DedupStageProf {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select($"doc_id", $"text")
    val idOffset = 1L << 24
    val nearDup = (0 until copies).map { c =>
      if (c == 0) docs
      else docs
        .withColumn("doc_id", $"doc_id" + lit(c.toLong * idOffset))
        .withColumn("text", concat($"text", lit(s" zqzprobe$c")))
    }.reduce(_ unionAll _)
      .select($"doc_id", graft.functions.tokenize($"text").as("toks"))

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val (toks, small, big) = timed("minhashBuckets") {
      Dedup.minhashBuckets(nearDup, "doc_id", "toks", 128, 32, 1000)
    }
    val nToks = timed("toks.count")(toks.count())
    val smallSizes = timed("small sizes") {
      small.select(size($"ids")).as[Int].collect().sorted.reverse
    }
    println(s"[prof] small buckets: n=${smallSizes.length} " +
      s"top=${smallSizes.take(10).mkString(",")} " +
      s"pairSum=${smallSizes.map(s => s.toLong * (s - 1) / 2).sum}")
    val bigSizes = timed("big sizes") {
      big.select(size($"ids")).as[Int].collect().sorted.reverse
    }
    println(s"[prof] big buckets: n=${bigSizes.length} " +
      s"top=${bigSizes.take(10).mkString(",")}")
    val toksBytes = toks
      .agg(coalesce(sum(size($"toks")), lit(0)).cast("long")).head().getLong(0) * 8L
    println(s"[prof] toksBytes=$toksBytes (budget=${128L << 20}) " +
      s"regime=${if (toksBytes <= (128L << 20)) "broadcast" else "chunked"}")
    val t0 = System.nanoTime()
    val keepers = Dedup.minhashDedupKeepers(nearDup, "doc_id", "toks", 0.8)
    val mapped = keepers.count()
    println(f"[prof] full keepers: $mapped rows " +
      f"${(System.nanoTime() - t0) / 1e9}%8.1f s")
    spark.stop()
  }
}

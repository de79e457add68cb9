package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{BqIndex, IvfIndex, Maintain}
import graft.plans.AnnCatalog

/** Sustained-maintenance probe for the `maintain` VERB itself: the
  * IndexMaintenanceProbe certifies the per-kind primitives (append /
  * delete / consolidate) through hand-rolled cycles; this probe
  * certifies that `Maintain.sweep` — the one command an operator
  * actually schedules — keeps a growing, deleting deployment healthy
  * end-to-end under the TABLE-AUTHORITATIVE protocol (delete lands in
  * the table first, the index is told via its tombstone `delete`; the
  * serving-set orphan excusal makes that validate at every point).
  * Per cycle, for an ivf and a bq registration:
  *
  *  1. a fresh 2k-row wave lands in both the table and the index
  *     (ids shifted per wave, elements hash-jittered — re-derivable),
  *  2. 100 rows of the previous wave are deleted: dropped from the
  *     new table generation AND tombstoned in the index,
  *  3. ONE `Maintain.sweep(recluster = true)` runs with deployment
  *     thresholds; compaction, validation, skew/recluster and budget
  *     refresh all fire on the sweep's own judgement.
  *
  * Asserted every cycle: every entry validates and the retune
  * confirmation serves at/above the floor. Terminal: after a forced
  * consolidate, ZERO deleted ids remain stored (tombstones were
  * applied physically somewhere along the cycles, none lost). The
  * printed table records the ef/nprobe trajectory — the budget
  * FOLLOWING corpus growth automatically is the probe's point.
  *
  * Usage: runMain graft.tools.MaintainLoopProbe [sfDir] [cycles] [parallelism]
  * (parallelism > 1 drives the sweep's per-entry session-clone mode —
  * the same sustained cycles must hold with both entries maintained
  * concurrently)
  */
object MaintainLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cycles = args.lift(1).map(_.toInt).getOrElse(6)
    val parallelism = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-maintloop").toString
    val kinds = Seq("ivf", "bq")
    var tbl = kinds.map(k => k -> s"$root/tbl-$k-c0").toMap
    tbl.values.foreach(base.write.parquet(_))
    IvfIndex.build(base, "vec_id", "embedding", s"$root/ivf", nlists = 16)
    BqIndex.build(base, "vec_id", "embedding", s"$root/bq")
    AnnCatalog.register(spark, tbl("ivf"), AnnCatalog.IndexMeta(
      s"$root/ivf", "vec_id", "embedding", "l2sq",
      ef = 64, kind = "ivf", nprobe = 4))
    AnnCatalog.register(spark, tbl("bq"), AnnCatalog.IndexMeta(
      s"$root/bq", "vec_id", "embedding", "l2sq", ef = 64, kind = "bq"))

    def wave(c: Int): DataFrame = base
      .withColumn("vec_id", col("vec_id") + lit(c.toLong << 20))
      .withColumn("embedding", expr(
        s"""transform(embedding, (x, j) ->
           |  CAST(x + (pmod(hash(vec_id, j, $c), 1000) / 1000.0 - 0.5)
           |       * 0.1 AS FLOAT))""".stripMargin))

    var allDeleted = Set.empty[Long]
    var failures = 0
    println("| cycle | kind | files | valid rows | knob | recall | skew | notes |")
    println("|---|---|---|---|---|---|---|---|")
    (1 to cycles).foreach { c =>
      val w = wave(c)
      // delete 100 ids of the PREVIOUS wave, table-first
      val delBase = if (c == 1) 0L else (c - 1).toLong << 20
      val del = (0L until 100L).map(delBase + _)
      allDeleted ++= del
      kinds.foreach { k =>
        val next = s"$root/tbl-$k-c$c"
        spark.read.parquet(tbl(k)).unionAll(w)
          .where(!col("vec_id").isin(del: _*))
          .write.parquet(next)
        // carry the registration (with its current, possibly retuned
        // knobs) onto the new table generation
        val cur = AnnCatalog.metaFor(spark, tbl(k), "embedding", "l2sq").get
        AnnCatalog.unregister(spark, tbl(k))
        AnnCatalog.register(spark, next, cur)
        tbl += k -> next
      }
      IvfIndex.append(w, "vec_id", "embedding", s"$root/ivf")
      BqIndex.append(w, "vec_id", "embedding", s"$root/bq")
      IvfIndex.delete(spark, s"$root/ivf", del)
      BqIndex.delete(spark, s"$root/bq", del)

      val entries = Maintain.sweep(spark, targetRecall = 0.8,
        queryCount = 5, maxWiden = 16, consolidateOver = 8,
        recluster = true, parallelism = parallelism)
      entries.foreach { e =>
        val ok = e.valid && e.recallAfter >= 0.8
        if (!ok) failures += 1
        println(f"| $c | ${e.kind} | ${e.filesAfter} | ${e.validatedRows} " +
          f"| ${e.knob}=${e.knobAfter} | ${e.recallAfter}%.3f " +
          f"| ${e.listSkew}%.1f | ${if (ok) "" else "FAIL "}" +
          f"${e.notes.take(90)} |")
      }
    }
    // terminal: force-apply any still-pending tombstones, then the
    // zero-tolerance leak check — nothing deleted may remain stored
    IvfIndex.consolidate(spark, s"$root/ivf")
    BqIndex.consolidate(spark, s"$root/bq", 4)
    val leaks = Seq("ivf" -> s"$root/ivf/data", "bq" -> s"$root/bq/bits")
      .map { case (kind, p) =>
        val stored = spark.read.parquet(p)
          .select(col("id")).collect().map(_.getLong(0)).toSet
        val leak = allDeleted.intersect(stored).size
        println(s"[maintloop] $kind terminal: ${stored.size} stored, " +
          s"$leak deleted-row leaks")
        leak
      }.sum
    tbl.values.foreach(t => AnnCatalog.unregister(spark, t))
    val bad = failures + leaks
    println(s"\n[maintloop] ${if (bad == 0) "PASS" else s"FAIL ($bad)"} " +
      s"over $cycles cycles (corpus ${base.count()} -> " +
      s"${spark.read.parquet(tbl("ivf")).count()} rows, " +
      s"${allDeleted.size} cumulative table-first deletes)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

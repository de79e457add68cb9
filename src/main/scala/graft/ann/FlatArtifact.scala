package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance plumbing for the flat parquet index artifacts
  * (bits/prefix/list layouts — [[BqIndex]], [[MrlIndex]], [[IvfIndex]],
  * [[IvfPqIndex]]): the append-accumulation file count serving layers
  * compact on, and the snapshot-preserving tombstone consolidate
  * (the `consolidate`/VACUUM analog of the reference's index
  * maintenance, with PG's vacuum-vs-delete concurrency contract:
  * deletes may race the compaction and keep masking).
  */
private[graft] object FlatArtifact {

  /** Parquet data files under `dir`, recursively — partitioned layouts
    * (`list_id=N/part-*.parquet`) count their leaf files. */
  def parquetFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, /*recursive=*/ true)
      var n = 0
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }

  /** `df` (keyed by an `id` column) minus the artifact's tombstoned
    * ids; no-op without a tombstones dir. The missing-row excusal
    * every validator's expected→stored direction shares: a pending
    * delete legitimately precedes its consolidate. */
  def minusTombstones(spark: SparkSession, path: String,
      df: DataFrame): DataFrame = {
    val t = new Path(s"$path/tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t))
      df.join(spark.read.parquet(t.toString), Seq("id"), "left_anti")
    else df
  }

  /** Compact `$path/$sub` applying tombstones PHYSICALLY, with the
    * snapshot-preserving protocol every flat artifact shares: the
    * tombstone FILES under `$path/tombstones` are snapshotted first —
    * only the snapshot is applied and retired, so a tombstone file
    * appended DURING the compaction survives the swap and keeps
    * masking. The subdir (never the artifact root — tombstones live
    * outside it) swaps by rename; single-writer for the data, like
    * every maintenance op here.
    *
    * `writeCompact(live, compactDir)` owns the layout-specific write
    * (coalesce for flat tables, partitionBy(list_id) for coarse-list
    * layouts).
    */
  def consolidateSubdir(
      spark: SparkSession,
      path: String,
      sub: String,
      what: String,
      writeCompact: (DataFrame, String) => Unit): Unit = {
    val tombDir = new Path(s"$path/tombstones")
    val fs = tombDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot =
      if (fs.exists(tombDir))
        fs.listStatus(tombDir).filter(_.isFile).map(_.getPath).toSeq
      else Seq.empty
    val snapParquet = snapshot.filter(_.getName.endsWith(".parquet"))
    val b = spark.read.parquet(s"$path/$sub")
    val live =
      if (snapParquet.nonEmpty)
        b.join(spark.read.parquet(snapParquet.map(_.toString): _*),
          Seq("id"), "left_anti")
      else b
    require(!live.isEmpty,
      s"graft: consolidate would leave an empty $what table under $path " +
        "(every row tombstoned) — drop and rebuild instead")
    val cur = new Path(s"$path/$sub")
    val compact = new Path(s"$path/${sub}__compact")
    if (fs.exists(compact)) fs.delete(compact, true) // stale prior attempt
    writeCompact(live, compact.toString)
    val old = new Path(s"$path/${sub}__old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(cur, old),
      s"graft: consolidate could not move $cur aside")
    if (!fs.rename(compact, cur)) {
      fs.rename(old, cur)
      throw new IllegalStateException(
        s"graft: consolidate swap failed under $path — original restored")
    }
    fs.delete(old, true)
    // retire ONLY the snapshotted tombstone files; the dir falls with
    // a non-recursive delete so a late arrival survives harmlessly
    snapshot.foreach(p => fs.delete(p, false))
    if (fs.exists(tombDir)) {
      val leftovers = fs.listStatus(tombDir).filter(_.isFile)
      if (leftovers.forall(st => !st.getPath.getName.endsWith(".parquet"))) {
        leftovers.foreach(st => fs.delete(st.getPath, false))
        try { fs.delete(tombDir, false); () }
        catch { case _: java.io.IOException => () }
      }
    }
    ()
  }
}

package graft.util

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/** [[Generations]] — the commit protocol behind the bucket-partitioned
  * consolidates: resolve prefers the highest COMMITTED generation,
  * uncommitted leftovers are invisible, clear() resets to legacy. */
class GenerationsSpec extends SparkTestBase {

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("resolve: legacy fallback, committed ordering, uncommitted ignored") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-gen").toString
    val base = new Path(s"$root/postings")
    // nothing exists: resolve falls back to the (absent) legacy base
    assert(Generations.resolve(fs, base) == base)
    assert(!Generations.exists(fs, base))
    // legacy dir only
    fs.mkdirs(base)
    assert(Generations.resolve(fs, base) == base)
    assert(Generations.exists(fs, base))
    // stage + commit generation 1: it now out-resolves the legacy dir
    val (s1, g1) = Generations.stage(fs, base)
    assert(s1.getName.startsWith(".") && g1.getName == "postings_g000001")
    fs.mkdirs(s1)
    val prev1 = Generations.commit(fs, base, s1, g1)
    assert(prev1.map(_.getName) == Seq("postings"),
      "commit must hand back the legacy dir for deletion")
    assert(Generations.resolve(fs, base).getName == "postings_g000001")
    // an UNCOMMITTED higher-numbered dir never serves...
    fs.mkdirs(new Path(s"$root/postings_g000005"))
    assert(Generations.resolve(fs, base).getName == "postings_g000001")
    // ...but it does occupy its number: the next stage goes above it
    val (s2, g2) = Generations.stage(fs, base)
    assert(g2.getName == "postings_g000006")
    fs.mkdirs(s2)
    val prev2 = Generations.commit(fs, base, s2, g2)
    assert(Generations.resolve(fs, base).getName == "postings_g000006")
    // previous = every older COMMITTED generation + legacy if present
    assert(prev2.map(_.getName).contains("postings_g000001"))
    // a sibling base with a name that merely shares the prefix must
    // not be confused for a generation of ours
    fs.mkdirs(new Path(s"$root/postings_extra_g000009"))
    assert(Generations.resolve(fs, base).getName == "postings_g000006")
    // clear: every generation-named sibling and staging leftover goes,
    // the resolve falls back to legacy
    Generations.clear(fs, base)
    assert(Generations.resolve(fs, base) == base)
    assert(!fs.exists(new Path(s"$root/postings_g000005")))
  }

  test("clearStale removes crashed-writer debris, keeps committed data") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-gen2").toString
    val base = new Path(s"$root/data")
    val (s1, g1) = Generations.stage(fs, base)
    fs.mkdirs(s1)
    Generations.commit(fs, base, s1, g1)
    // crashed-writer debris: an UNCOMMITTED gen dir (rename landed,
    // marker never created) and a staging leftover
    fs.mkdirs(new Path(s"$root/data_g000007"))
    fs.mkdirs(new Path(s"$root/.data_g000008.inprogress"))
    Generations.clearStale(fs, base)
    assert(!fs.exists(new Path(s"$root/data_g000007")))
    assert(!fs.exists(new Path(s"$root/.data_g000008.inprogress")))
    // the committed generation still serves
    assert(Generations.resolve(fs, base).getName == "data_g000001")
  }

  test("resolve is memoized per base; mutators invalidate") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-gen3").toString
    val base = new Path(s"$root/data")
    val (s1, g1) = Generations.stage(fs, base)
    fs.mkdirs(s1)
    Generations.commit(fs, base, s1, g1)
    assert(Generations.resolve(fs, base).getName == "data_g000001")
    // prove the memo: delete the generation BEHIND the API's back —
    // resolve must keep answering from the memo without re-listing
    // (the single-writer contract makes out-of-band deletion illegal,
    // which is exactly what lets every read/append skip the listing)
    fs.delete(g1, true)
    assert(Generations.resolve(fs, base).getName == "data_g000001")
    // exists() rides the same memo
    assert(Generations.exists(fs, base))
    // an explicit invalidate drops it; resolve re-lists and falls back
    Generations.invalidate(fs, base)
    assert(Generations.resolve(fs, base) == base)
    assert(!Generations.exists(fs, base))
  }
}

package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation-committed directory swap for the bucket-partitioned
  * index layouts (sparse `tb=*` postings, multivec `cent=*` postings).
  *
  * The classic two-rename swap (`cur` → `old`, `compact` → `cur`) has
  * a window where NO directory exists at the serving path — harmless
  * on a filesystem with atomic rename, but a racing reader on an
  * object store can observe a missing table mid-swap (the reference
  * never faces this: PostgreSQL swaps relfilenodes transactionally).
  * Generations retire the window entirely by never renaming the
  * serving path at all:
  *
  *  - each compaction writes a NEW sibling `<base>_gNNNNNN` (staged
  *    under a dot-prefixed name while incomplete, so no reader or
  *    parquet lister ever sees a half-written generation);
  *  - a tiny `_graft_committed` marker file, created AFTER the data is
  *    fully in place, is the atomic commit — a file either exists or
  *    it does not, on every store;
  *  - readers [[resolve]] the highest COMMITTED generation (one
  *    directory listing — these live next to few-file artifacts, never
  *    on a data-proportional path) and fall back to the legacy
  *    un-suffixed directory, so pre-generation artifacts keep serving
  *    unmodified;
  *  - only after the new generation is committed does the previous one
  *    get deleted. At every instant a resolving reader finds a
  *    complete, committed generation.
  *
  * A reader holding file handles INTO the previous generation while it
  * is deleted can still fail mid-scan — that exposure is identical to
  * the old swap's `delete(old)` and inherent to single-copy
  * compaction; the class this mechanism eliminates is the
  * missing-DIRECTORY observation at resolve time.
  */
object Generations {

  val Marker = "_graft_committed"
  private val GenRe = "(.*)_g(\\d{6})$".r

  // resolve() costs a parent listing plus a marker-exists per committed
  // generation, and it sits on EVERY read and EVERY micro-batch append
  // of the sparse/multivec layouts — the r16 driver measured the whole
  // lifecycle family 20-40% slower for it. The committed set changes
  // only through commit/clear/clearStale, and every consolidate here is
  // single-writer by contract, so the resolved path is memoized per
  // qualified base path and invalidated by those mutators. An
  // out-of-process writer would not be visible to the memo — the same
  // single-JVM exposure the fingerprint ArtifactCache documents.
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Path]()

  private def memoKey(fs: FileSystem, base: Path): String =
    fs.makeQualified(base).toString

  /** Drop the memoized resolution for `base` — called by every mutator
    * of the committed set, and available to tests / external swappers. */
  private[graft] def invalidate(fs: FileSystem, base: Path): Unit =
    memo.remove(memoKey(fs, base))

  /** Memo entry count (test introspection). */
  private[graft] def memoSize: Int = memo.size()

  private def genName(base: Path, n: Int): String =
    f"${base.getName}_g$n%06d"

  /** Committed generations of `base`, ascending by number. */
  private def committed(fs: FileSystem, base: Path): Seq[(Int, Path)] = {
    val parent = base.getParent
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName match {
          case GenRe(stem, num) if stem == base.getName =>
            Some((num.toInt, st.getPath))
          case _ => None
        }
      }
      .filter { case (_, p) => fs.exists(new Path(p, Marker)) }
      .sortBy(_._1)
  }

  /** The directory currently serving `base`'s data: the highest
    * committed generation, else the legacy `base` itself. Memoized —
    * see the memo note above; the listing runs once per base path per
    * JVM and once more after each commit/clear. */
  def resolve(fs: FileSystem, base: Path): Path = {
    val k = memoKey(fs, base)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val r = committed(fs, base).lastOption.map(_._2).getOrElse(base)
      // a crude bound: base paths are artifact roots (a handful per
      // session in practice), but a long session cycling fresh /tmp
      // artifacts must not grow the memo without limit
      if (memo.size() > 4096) memo.clear()
      memo.put(k, r)
      r
    }
  }

  /** True when either the legacy dir or any committed generation
    * exists — the layout-sniff form of [[resolve]]. Reuses the
    * [[resolve]] memo: a memoized generation answers without listing. */
  def exists(fs: FileSystem, base: Path): Boolean =
    fs.exists(base) || resolve(fs, base) != base

  /** Begin writing the next generation: returns (staging dir to write
    * the data into, the final generation path). The staging dir is
    * dot-prefixed (invisible to parquet listings and to [[resolve]]);
    * a stale staging dir from a crashed prior attempt is cleared so
    * retries never brick on an existing path. */
  def stage(fs: FileSystem, base: Path): (Path, Path) = {
    val parent = base.getParent
    // next = max over ALL generation-named siblings (committed or not:
    // an uncommitted leftover still occupies its number) + 1
    val maxSeen = (if (parent != null && fs.exists(parent))
      fs.listStatus(parent).toSeq.flatMap { st =>
        st.getPath.getName match {
          case GenRe(stem, num) if stem == base.getName => Some(num.toInt)
          case _ => None
        }
      }
    else Seq.empty).foldLeft(0)(math.max)
    val gen = new Path(parent, genName(base, maxSeen + 1))
    val staging = new Path(parent, "." + gen.getName + ".inprogress")
    if (fs.exists(staging)) fs.delete(staging, true)
    (staging, gen)
  }

  /** Remove UNCOMMITTED generation dirs and staging leftovers of
    * `base` — debris from a writer that crashed between publish and
    * commit. They never serve (no marker) but they occupy generation
    * numbers and, for layouts whose fragmentation measure lists the
    * whole artifact root, read as permanent fragmentation that
    * re-triggers futile compactions forever. Single-writer maintenance
    * (the documented contract of every consolidate here) makes this
    * safe to call at the start of a compaction: no sibling writer can
    * be mid-commit. */
  def clearStale(fs: FileSystem, base: Path): Unit = {
    val parent = base.getParent
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        val stale = (n match {
          case GenRe(stem, _) => stem == base.getName &&
            !fs.exists(new Path(st.getPath, Marker))
          case _ => n.startsWith("." + base.getName + "_g")
        })
        if (stale) { fs.delete(st.getPath, true); () }
      }
    // uncommitted debris never served, so the resolution is unchanged —
    // invalidated anyway for safety (runs once per compaction)
    invalidate(fs, base)
  }

  /** Remove every generation-named sibling of `base` (committed or
    * not) plus staging leftovers — a REBUILD starts over from the
    * legacy layout, and a stale committed generation must not
    * out-resolve the fresh data. */
  def clear(fs: FileSystem, base: Path): Unit = {
    val parent = base.getParent
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        val matches = n match {
          case GenRe(stem, _) => stem == base.getName
          case _ => n.startsWith("." + base.getName + "_g")
        }
        if (matches) { fs.delete(st.getPath, true); () }
      }
    invalidate(fs, base)
  }

  /** Publish a staged generation: rename into its final name, then
    * create the commit marker. The marker — not the rename — is what
    * readers trust, so a store with non-atomic directory rename still
    * never serves a half-visible generation. Returns the paths of the
    * directories the new generation REPLACES (every older committed
    * generation), which the caller deletes once it no longer needs
    * them; the legacy `base` dir, when present, is included. */
  def commit(fs: FileSystem, base: Path, staging: Path,
      gen: Path): Seq[Path] = {
    val previous = committed(fs, base).map(_._2) ++
      (if (fs.exists(base)) Seq(base) else Seq.empty)
    if (!fs.rename(staging, gen)) throw new IllegalStateException(
      s"graft: could not publish generation $gen (staging at $staging " +
        "left for inspection)")
    val out = fs.create(new Path(gen, Marker), true)
    out.close()
    invalidate(fs, base)
    previous
  }
}

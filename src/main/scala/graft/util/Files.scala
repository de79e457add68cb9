package graft.util

/** Small local-filesystem helpers for gate/test scaffolding (temp
  * stream-source dirs and the like) — not a storage abstraction; the
  * engine's real I/O goes through Hadoop FileSystem. */
object Files {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}

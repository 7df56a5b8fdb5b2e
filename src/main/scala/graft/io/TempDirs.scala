package graft.io

import java.io.File
import java.nio.file.{Files, Path}

/** Per-invocation scratch directories (landing zones, stream source /
  * sink / checkpoint dirs) registered for deletion at JVM exit, so a
  * warmup+timed bench run doesn't accumulate one tree per invocation.
  * Deletion can't happen eagerly inside a query builder: the returned
  * DataFrame is lazy and reads the directory only when the caller runs
  * an action.
  */
object TempDirs {
  def registered(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p
  }

  private val keyedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  /** Stable scratch directory per (prefix, key) WITHIN this JVM — the
    * build-once/query-many surface: a bench or probe run's untimed
    * warmup pays an index build into the keyed dir and every timed
    * pass (and every other query keyed the same way) reuses it. Still
    * registered for deletion at JVM exit. Key by the INPUT data dir so
    * a probe running 1× and 10× datasets in one JVM gets two dirs. */
  def keyed(prefix: String, key: String): Path =
    keyedDirs.computeIfAbsent(s"$prefix|$key", _ => registered(prefix))

  /** Listing fingerprint of the file tree at `path` — per-file (name,
    * length, mtime) hashes combined order-independently; never reads
    * file contents. Fold it into a [[keyed]] key so a dataset that is
    * REGENERATED at the same path within one JVM maps to a fresh
    * scratch dir instead of silently serving artifacts built from the
    * old bytes. */
  def listingFingerprint(path: String): String = {
    def walk(f: File): Iterator[File] =
      if (f.isDirectory) Option(f.listFiles).iterator.flatMap(_.iterator).flatMap(walk)
      else Iterator.single(f)
    val h = walk(new File(path))
      .map(f => s"${f.getName}|${f.length}|${f.lastModified}".hashCode.toLong)
      .sum
    java.lang.Long.toHexString(h)
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}

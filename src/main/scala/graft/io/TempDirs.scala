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

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}

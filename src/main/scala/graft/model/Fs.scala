package graft.model

import java.io.File

/** Tiny process-local filesystem helpers for build-once scratch layouts
  * (nn15's partitioned IVF directory, g6's bucketed warehouse): register
  * a directory for recursive deletion at JVM exit so repeated harness
  * runs don't accumulate tmp trees. File.deleteOnExit can't remove
  * non-empty directories, hence the explicit shutdown hook.
  */
object Fs {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile private var hookInstalled = false

  def deleteRecursivelyOnExit(dir: File): Unit = {
    registered.add(dir.getAbsolutePath)
    if (!hookInstalled) synchronized {
      if (!hookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          registered.forEach(p => deleteRecursively(new File(p)))
        }, "graft-scratch-cleanup"))
        hookInstalled = true
      }
    }
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}

package graft.model

/** Process-wide build-once guard for scratch layouts (nn15's partitioned
  * IVF directory, g6's bucketed table): run `build` at most once per key
  * per JVM, marking the key done only AFTER the build COMPLETES — a
  * failed build is retried on the next call, never served partial. The
  * double-checked-lock invariant (mark-after-success, re-check under the
  * lock) lives here once instead of being re-hand-rolled per layout.
  *
  * `invalidUnless` re-validates a "done" key against external state that
  * can move underneath the process (g6: the catalog is per-SESSION while
  * this guard is per-process, so a fresh SparkSession must rebuild even
  * though another session already did). */
object BuildOnce {
  private val done = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val lock = new Object

  def once(key: String, invalidUnless: => Boolean = true)(build: => Unit): Unit = {
    if (!done.contains(key) || !invalidUnless) lock.synchronized {
      if (!done.contains(key) || !invalidUnless) {
        build
        done.add(key)
      }
    }
  }
}

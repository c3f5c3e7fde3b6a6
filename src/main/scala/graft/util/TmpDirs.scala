package graft.util

/** Process-scoped scratch directories. Derived layout copies (the
  * day-partitioned events table, rollup MV tables) are built once per
  * (session, dir) and must outlive every consumer in the JVM — but
  * nothing should outlive the JVM: repeated local runs of Bench/Verify
  * were accumulating gigabytes of orphaned `createTempDirectory` output
  * in /tmp. One shutdown hook deletes every registered scratch dir on
  * clean exit (a kill -9 still leaks; the next run's dirs are fresh
  * either way because names are randomized). */
object TmpDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try graft.store.FsMaint.deleteTree(d)
        catch { case _: Exception => () }   // exit-path best effort
      }))
  }

  /** Create a scratch directory that is deleted on JVM exit. */
  def scratch(prefix: String): String = {
    hook
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }
}

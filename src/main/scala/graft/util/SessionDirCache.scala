package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(SparkSession, dir) memoization of a value derived from an
  * immutable dataset directory — THE shared-intermediate pattern of the
  * library (cached relations, the token/shingle explosions, the
  * co-purchase pair table, bucketed/partitioned layout copies): build
  * once per session+dir, reuse across every consumer. One
  * implementation instead of a hand-rolled ConcurrentHashMap per module
  * gives a single place for the immutable-dir contract and the eviction
  * policy.
  *
  * Eviction: a long-lived session (the 225-query bench/verify harness;
  * at 100 TB, any resident service) must not hoard dead intermediates —
  * measured round 8, the suite's localCheckpoint blocks accumulated to
  * ~45 GiB at sf1 and OOM'd the default 24 GiB driver. Caches whose
  * values pin executor/driver storage (localCheckpoint'ed DataFrames)
  * are built with a `release` hook and registered globally; a harness
  * calls [[SessionDirCache.tick]] once per unit of work and
  * [[SessionDirCache.sweep]] under memory pressure, which drops idle
  * entries oldest-first and releases their storage. Consumers rebuild
  * on next use (the entry is REMOVED before its blocks are freed —
  * required, because a localCheckpoint's lineage is truncated and lost
  * blocks are unrecoverable by recompute). Caches holding cheap lazy
  * values or on-disk layout paths pass no hook and are never swept:
  * evicting them frees no memory and forces an expensive rebuild.
  *
  * Without any tick/sweep caller (tests, single-query use) behavior is
  * exactly the pre-eviction contract: entries live for the JVM.
  */
final class SessionDirCache[T](release: Option[T => Unit] = None) {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), SessionDirCache.Entry[T]]()
  if (release.isDefined) SessionDirCache.register(this)

  /** Get or build the value for (s, dir). `build` runs at most once per
    * key (ConcurrentHashMap.computeIfAbsent semantics); each hit stamps
    * the entry with the current generation for idle-age sweeping.
    *
    * Runs under the shared side of [[SessionDirCache.lock]]: a sweep can
    * never interleave between computeIfAbsent returning an entry and the
    * generation stamp landing — without the lock, a concurrent sweeper
    * could remove the entry and free its localCheckpoint blocks in that
    * window, and a freed localCheckpoint is unrecoverable (lineage
    * truncated). With it, any sweep ordered after this call sees
    * lastUsed = current generation, which `sweep(keep ≥ 1)` spares.
    * Holding the returned value ACROSS a later tick+sweep remains the
    * caller's contract (one unit of work per tick). */
  def apply(s: SparkSession, dir: String)(build: (SparkSession, String) => T): T = {
    val rl = SessionDirCache.lock.readLock
    rl.lock()
    try {
      val e = m.computeIfAbsent((s, dir), { case (a, b) =>
        new SessionDirCache.Entry(build(a, b), SessionDirCache.generation) })
      e.lastUsed = SessionDirCache.generation
      e.value
    } finally rl.unlock()
  }

  /** Instance-scoped sweep (tests; targeted eviction): evict THIS
    * cache's entries idle for more than `keep` generations. No-op for
    * caches without a release hook — evicting them frees nothing. */
  def sweepIdle(keep: Long): Int =
    if (release.isEmpty) 0
    else sweepOlder(SessionDirCache.generation - keep)

  private[util] def sweepOlder(cutoff: Long): Int = {
    // exclusive side of the apply/sweep lock: no apply may be mid-flight
    // while entries are removed and their storage freed
    val wl = SessionDirCache.lock.writeLock
    wl.lock()
    try {
      var n = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.lastUsed < cutoff) {
          it.remove() // remove FIRST: no consumer may see a freed checkpoint
          release.foreach(f => f(e.getValue.value))
          n += 1
        }
      }
      n
    } finally wl.unlock()
  }
}

object SessionDirCache {
  private[util] final class Entry[T](val value: T, @volatile var lastUsed: Long)

  private val gen = new java.util.concurrent.atomic.AtomicLong(0)

  /** apply (shared) vs sweep (exclusive) exclusion across ALL caches: the
    * enforcement of the "sweep only between units of work" contract the
    * scaladoc used to merely document. Reads are uncontended readLock
    * acquisitions; sweeps are rare (storage pressure only). */
  private[util] val lock = new java.util.concurrent.locks.ReentrantReadWriteLock()
  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[SessionDirCache[_]]()
  private def register(c: SessionDirCache[_]): Unit = { registry.add(c); () }

  private[util] def generation: Long = gen.get

  /** Advance the idle clock — call once per unit of work (per bench
    * query). Entries untouched for `keep` ticks become sweepable. */
  def tick(): Long = gen.incrementAndGet()

  /** Evict entries of every releasable cache idle for more than `keep`
    * generations (keep=1 spares only entries the latest unit of work
    * touched). Returns the number of entries evicted. Callers sweep
    * between units of work, never concurrently with one — a swept
    * localCheckpoint cannot be recomputed, only rebuilt via a fresh
    * cache miss. */
  def sweep(keep: Long): Int = {
    val cutoff = gen.get - keep
    var n = 0
    registry.forEach(c => n += c.sweepOlder(cutoff))
    n
  }

  /** Release hook for DataFrame-valued caches: drops CacheManager
    * entries (persist case) and the block-manager storage of a
    * localCheckpoint'ed plan (LogicalRDD case). Best-effort — a release
    * failure must never take down the harness that swept. */
  val releaseDf: Option[DataFrame => Unit] = Some { df =>
    try {
      df.unpersist(blocking = false)
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false); ()
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** [[releaseDf]] lifted over Option-valued caches. */
  val releaseOptDf: Option[Option[DataFrame] => Unit] =
    Some(o => o.foreach(releaseDf.get))
}

package graft.util

import org.apache.spark.sql.SparkSession

/** Per-(SparkSession, dir) memoization of a value derived from an
  * immutable dataset directory — THE shared-intermediate pattern of the
  * library (cached relations, the token/shingle explosions, the
  * co-purchase pair table, bucketed/partitioned layout copies): build
  * once per session+dir, reuse across every consumer. One
  * implementation instead of a hand-rolled ConcurrentHashMap per module
  * gives a single place for the immutable-dir contract and any future
  * eviction policy. Entries live for the JVM (sessions here are
  * process-long); test fixtures get fresh tmp dirs, so staleness cannot
  * occur while the contract holds.
  */
final class SessionDirCache[T] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), T]()

  /** Get or build the value for (s, dir). `build` runs at most once per
    * key (ConcurrentHashMap.computeIfAbsent semantics). */
  def apply(s: SparkSession, dir: String)(build: (SparkSession, String) => T): T =
    m.computeIfAbsent((s, dir), { case (a, b) => build(a, b) })
}

package graft.util

import org.apache.spark.sql.SparkSession

/** Session derivation — the repo's standard fix for "this code needs a
  * SESSION-scoped knob but must not flip it on the caller's session":
  * a `newSession()` shares the SparkContext (and the cached data /
  * executors) but owns an isolated SQLConf and optimizer-rule list, so
  * confs set or rules installed on it are invisible to concurrent work
  * on the original session. Used by the events reader (timestamp
  * normalization confs), q120 (range-band width), and q153 (MV-routing
  * enablement). */
object Sessions {
  /** A derived session carrying the caller's MODIFIABLE runtime confs
    * (newSession starts from SparkConf defaults — the session zone and
    * shuffle-partition settings must carry over or derived plans resolve
    * timestamps/partitioning differently than the caller's would). */
  def derived(s: SparkSession): SparkSession = {
    val c = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      if (c.conf.isModifiable(k)) c.conf.set(k, v)
    }
    c
  }
}

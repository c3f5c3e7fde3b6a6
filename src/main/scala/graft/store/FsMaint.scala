package graft.store

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Directory-maintenance helpers shared by the store compactor and the
  * streaming rollup maintainer. One definition so the two can't diverge —
  * an earlier non-recursive delete in the compactor could wedge on a
  * crashed rewrite's `_temporary/` subtree while the maintainer's
  * recursive variant was correct. */
private[graft] object FsMaint {

  /** List a directory's entries, closing the stream (long-running
    * maintainers call this every micro-batch — an unclosed Files.list
    * leaks one fd per call until GC). Missing path → empty. */
  def listDir(p: Path): Seq[Path] =
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.toList finally s.close()
    }

  /** Recursive deepest-first delete; tolerates a missing root and entries
    * that vanish concurrently — INCLUDING during the walk itself (two
    * maintenance paths can race on the same crashed-write subtree; a
    * traversal that throws on a vanished entry would kill a micro-batch
    * over a tree that is already being cleaned up). Only the vanished-
    * entry races are swallowed: a permission error or transient IO
    * failure propagates, so a caller never treats an intact tree as
    * deleted (stale files would otherwise poison replay logic). */
  def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    val entries =
      try {
        val w = Files.walk(p)
        try w.iterator().asScala.toList finally w.close()
      } catch {
        // root or an entry vanished mid-walk: someone else is deleting it
        case _: java.nio.file.NoSuchFileException => return
        case e: java.io.UncheckedIOException
          if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => return
      }
    entries.reverse.foreach(Files.deleteIfExists(_))
  }
}

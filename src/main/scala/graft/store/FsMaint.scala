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
    * that vanish concurrently. */
  def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    val w = Files.walk(p)
    val entries = try w.iterator().asScala.toList finally w.close()
    entries.reverse.foreach(Files.deleteIfExists(_))
  }
}

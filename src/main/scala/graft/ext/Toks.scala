package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Per-(session, dir) cache of the exploded corpus token table
  * `(doc_id, source, tok)` — the other shared intermediate of the text
  * family (the dedup family's twin is `Dedup.shingleCache`): q34, q58,
  * q69, q75, q93, q111, q112, q113, q140 all start from the same
  * split+explode. Eagerly materialized once per dir; consumers project
  * the columns they need (column pruning makes the narrow reads free).
  * At 100 TB this is a shared parquet checkpoint table written once by
  * the pipeline's tokenize stage. Same immutable-dir contract as
  * [[graft.tables.Tables]].
  */
object Toks {
  private val cache = new graft.util.SessionDirCache[DataFrame](graft.util.SessionDirCache.releaseDf)

  def apply(s: SparkSession, dir: String): DataFrame =
    cache(s, dir) { (sess, d) =>
      Tables.documents(sess, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .localCheckpoint(true)
    }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, ExtendedQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's (name, queryFn, oracleSql) entries:
  *  - graft.queries.CoreQueries — Tier B OLAP operators (B1–B10)
  *  - graft.ext.*               — Tier C extensions (dedup, similarity,
  *                                text analysis, temporal joins, JSON,
  *                                multimodal)
  */
object SparkEntry {

  private def modules: Seq[Seq[(String, (SparkSession, String) => DataFrame, Option[String])]] =
    Seq(
      CoreQueries.entries,
      ExtendedQueries.entries,
      ext.Temporal.entries,
      ext.Dedup.entries,
      ext.Similarity.entries,
      ext.TextAnalysis.entries,
      ext.JsonProps.entries,
      ext.Multimodal.entries,
      ext.Mp4.entries,
      ext.Mkv.entries,
      ext.Adts.entries,
      ext.Ogg.entries,
      ext.ImageHeaders.entries,
      ext.AcScan.entries,
      ext.HtmlExtract.entries,
      ext.UrlOps.entries,
      ext.Bm25.entries,
      ext.UnicodeNorm.entries,
      ext.SpanCorrupt.entries,
      ext.ImageDhash.entries,
      ext.AudioFp.entries,
      ext.Curation.entries,
      ext.EventAnalytics.entries,
      ext.SeriesStats.entries,
      ext.CorpusStats.entries,
      ext.GraphOps.entries,
      store.Bucketing.entries,
      store.EvolutionQuery.entries,
      store.ChangeFeedQuery.entries,
    )

  private lazy val all = {
    val entries = modules.flatten
    // a duplicate name would silently shadow a query in the Map below —
    // and the driver's correctness report would just shrink by one row
    val dups = entries.groupBy(_._1).collect { case (n, es) if es.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names registered: ${dups.mkString(", ")}")
    entries
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03MonthRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}

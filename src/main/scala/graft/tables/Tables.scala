package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through here so every query sees the same source options.
  * Parquet + Catalyst give predicate pushdown / column pruning for free —
  * each query's `.select`/`.filter` reaches the scan (verify via
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  /** Per-(session, path) relation cache — the catalog role: each
    * spark.read.parquet re-lists the directory and re-reads footers to
    * build a fresh InMemoryFileIndex, which at ~60 queries × ~2 tables
    * each is pure repeated driver work. Cached analyzed relations share
    * one file index. (Test fixtures overwrite parquet dirs in place, so
    * tests bypass the cache via fresh paths — tmpDir is unique per use.) */
  private val cache = new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for (PARQUET_TYPE_ILLEGAL). Read it as a long and truncate to
    * microseconds with integer division (double division would lose
    * precision on ~1.7e18 ns epochs) — the same truncation DuckDB applies,
    * so oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
  /** events with a time-range predicate applied to the RAW nanosecond
    * column before conversion: the nanos→timestamp expression blocks
    * parquet pushdown of post-conversion timestamp predicates (the scan
    * would read every row group), while a plain long comparison pushes to
    * row-group min/max stats. Bounds are whole-second UTC timestamps, so
    * ns and truncated-µs ranges select identical rows. */
  def eventsInRange(s: SparkSession, d: String, fromUtc: String, toUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    def ns(t: String): Long =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    if (df.schema("ts").dataType == LongType)
      df.filter(col("ts") >= ns(fromUtc) && col("ts") < ns(toUtc))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      df.filter(col("ts") >= to_timestamp(lit(fromUtc)) && col("ts") < to_timestamp(lit(toUtc)))
  }

  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

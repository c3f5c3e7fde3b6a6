package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, LongType, TimestampNTZType, TimestampType}

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
  private val cache = new graft.util.SessionDirCache[DataFrame]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache(spark, s"$dir/$name.parquet") { (s, p) => s.read.parquet(p) }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** The events relation built under a CLONED session with the two
    * events-specific parquet reader confs set: nanosAsLong must be on for
    * the NANOS encoding to be readable at all, and NTZ inference must be
    * off so µs/NTZ data lands as LTZ. Both are SESSION-scoped knobs with
    * no per-read DataFrameReader option (checked against Spark 4's
    * ParquetOptions), and flipping them on the caller's session — even
    * set/restore-scoped — leaks to a concurrent unrelated
    * `spark.read.parquet` on another thread, which would then silently
    * resolve a different timestamp type. A derived session (same
    * SparkContext, isolated SQLConf) means the flip is never
    * visible outside; the relation keeps working from the caller's
    * session because a file-source scan executes against the session its
    * HadoopFsRelation was built with. Cached per (session, path) like
    * every other table, so the clone is built once. */
  private def eventsRelation(s: SparkSession, d: String): DataFrame =
    cache(s, s"$d/events.parquet") { (sess, p) =>
      val c = graft.util.Sessions.derived(sess)
      c.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      c.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      c.read.parquet(p)
    }

  /** events.ts normalized to session-zone TIMESTAMP (micros) whatever the
    * parquet logical type. The driver's generator has shipped three
    * encodings across rounds, and every downstream time op
    * (`unix_micros`, window frames, the native as-of join) assumes LTZ:
    *   - TIMESTAMP(NANOS): no native Spark type (PARQUET_TYPE_ILLEGAL) —
    *     read as long via legacy.parquet.nanosAsLong and truncate to µs
    *     with integer division (double division loses precision at
    *     ~1.7e18 ns; DuckDB truncates the same way, so oracles agree).
    *   - TIMESTAMP(µs, isAdjustedToUTC=false): Spark 4 infers
    *     TIMESTAMP_NTZ by default and `unix_micros` is LTZ-only →
    *     disable inferTimestampNTZ around the read so it lands as LTZ
    *     (same 8-byte micros; the session zone is UTC so wall-clock
    *     values are unchanged), and cast defensively in case a cached
    *     relation was built before the conf was set.
    *   - TIMESTAMP(µs, adjusted): already LTZ, pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = eventsRelation(s, d)
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  /** events with a time-range predicate applied to the RAW nanosecond
    * column before conversion: the nanos→timestamp expression blocks
    * parquet pushdown of post-conversion timestamp predicates (the scan
    * would read every row group), while a plain long comparison pushes to
    * row-group min/max stats. Bounds are whole-second UTC timestamps, so
    * ns and truncated-µs ranges select identical rows. */
  def eventsInRange(s: SparkSession, d: String, fromUtc: String, toUtc: String): DataFrame = {
    val df = eventsRelation(s, d)
    def ns(t: String): Long =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    df.schema("ts").dataType match {
      case LongType =>
        df.filter(col("ts") >= ns(fromUtc) && col("ts") < ns(toUtc))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // filter on the native NTZ column (pushes to row-group stats),
        // THEN normalize to LTZ for downstream ops
        df.filter(col("ts") >= to_timestamp_ntz(lit(fromUtc)) &&
                  col("ts") < to_timestamp_ntz(lit(toUtc)))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        df.filter(col("ts") >= to_timestamp(lit(fromUtc)) && col("ts") < to_timestamp(lit(toUtc)))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  /** embeddings.embedding normalized to array<float> — the element type
    * every vector kernel (CosineSimExpr, LshBucketExpr, …) binds to.
    * Same defensive posture as [[events]]: if a future testdata round
    * ships float64, or JSON-string-serialized, vectors, normalize at the
    * one choke point instead of failing analysis in 30 queries.
    * (float64→float32 narrowing is intentional: the kernels are float32
    * and today's testdata is float32-exact, so narrowed values are
    * bit-identical; if genuinely-float64 vectors ever arrive the oracle
    * legs must be quantized through float32 the same way — see
    * EmbEncodingMatrixSpec.) */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(FloatType, _) => df
      case org.apache.spark.sql.types.StringType =>
        // a cast from string is unsupported; parse the JSON array form
        df.withColumn("embedding",
          from_json(col("embedding"), org.apache.spark.sql.types.ArrayType(FloatType)))
      case _ => df.withColumn("embedding",
        col("embedding").cast(org.apache.spark.sql.types.ArrayType(FloatType)))
    }
  }
}

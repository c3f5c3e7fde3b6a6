package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.TraceSchema

/** Columnar trace store (SURVEY.md §1.5): the Spark-native analogue of the
  * reference's MergeTree layout (/root/reference/trace-converter.py:22-24).
  *
  * | MergeTree decision            | here                                   |
  * |-------------------------------|----------------------------------------|
  * | PARTITION BY toYYYYMM(Time)   | Hive-style partitionBy(ym) → Catalyst  |
  * |                               | partition pruning on time predicates   |
  * | ORDER BY (Time)               | sortWithinPartitions(Time) → parquet   |
  * |                               | row-group min/max skipping             |
  * | CODEC(ZSTD)                   | parquet zstd                           |
  * | 1 file = 1 INSERT, no buffer  | 1 micro-batch = 1 append commit;       |
  * |                               | repartition bounds small files         |
  * (the reference's small-insert degradation, README.md:193-206, maps to
  * Spark's small-file problem — same fix: batch-sized commits.)
  */
object TraceStore {

  /** Append a normalized batch to the partitioned table path.
    *
    * `splitsPerMonth` bounds write parallelism per month partition: the
    * default 1 mirrors the reference's whole-batch-per-INSERT contract
    * (one file per month per micro-batch, no small files); a backfill on a
    * large cluster passes executor-count-sized splits so a single hot
    * month does not serialize onto one task. */
  def append(df: DataFrame, tablePath: String, splitsPerMonth: Int = 1): Unit = {
    val withYm = df.withColumn(TraceSchema.PartitionCol,
      date_format(col("Time"), "yyyyMM"))
    val parted =
      if (splitsPerMonth <= 1) withYm.repartition(col(TraceSchema.PartitionCol))
      else withYm.repartition(col(TraceSchema.PartitionCol),
        pmod(xxhash64(col("Time")), lit(splitsPerMonth.toLong)))
    parted
      .sortWithinPartitions(col("Time"))
      .write
      .mode("append")
      .option("compression", "zstd")
      .partitionBy(TraceSchema.PartitionCol)
      .parquet(tablePath)
  }

  /** Read the stored table; time predicates prune ym partitions first.
    * The schema is declared explicitly so ym keeps its contractual STRING
    * type (partition-type inference would read ym=201905 back as int) —
    * without touching any session-global configuration. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.types.StructType(
        TraceSchema.target.fields :+
        org.apache.spark.sql.types.StructField(TraceSchema.PartitionCol,
          org.apache.spark.sql.types.StringType)))
      .parquet(tablePath)

  /** Month-pruned time-range scan (B1): the partition filter on ym is
    * derivable from the Time range, and Catalyst prunes directories before
    * listing files. */
  def timeRange(spark: SparkSession, tablePath: String,
                from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    // ym bounds must be derived in the SAME zone date_format used at write
    // time (the session time zone), or month-boundary rows silently fall
    // outside the pruned partitions.
    val tz = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    val fmt = new java.text.SimpleDateFormat("yyyyMM")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(tz))
    read(spark, tablePath)
      .filter(col(TraceSchema.PartitionCol) >= fmt.format(from) &&
              col(TraceSchema.PartitionCol) <= fmt.format(to) &&
              col("Time") >= lit(from) && col("Time") < lit(to))
  }
}

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

  /** Append a normalized batch to the partitioned table path. Partition
    * count scales with batch size so a 1000-executor cluster writes in
    * parallel while a trace-file-sized batch stays a single file per
    * month. */
  def append(df: DataFrame, tablePath: String): Unit = {
    val withYm = df.withColumn(TraceSchema.PartitionCol,
      date_format(col("Time"), "yyyyMM"))
    withYm
      .repartition(col(TraceSchema.PartitionCol))
      .sortWithinPartitions(col("Time"))
      .write
      .mode("append")
      .option("compression", "zstd")
      .partitionBy(TraceSchema.PartitionCol)
      .parquet(tablePath)
  }

  /** Read the stored table; time predicates prune ym partitions first. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath)

  /** Month-pruned time-range scan (B1): the partition filter on ym is
    * derivable from the Time range, and Catalyst prunes directories before
    * listing files. */
  def timeRange(spark: SparkSession, tablePath: String,
                from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    val fmt = new java.text.SimpleDateFormat("yyyyMM")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    read(spark, tablePath)
      .filter(col(TraceSchema.PartitionCol) >= fmt.format(from) &&
              col(TraceSchema.PartitionCol) <= fmt.format(to) &&
              col("Time") >= lit(from) && col("Time") < lit(to))
  }
}

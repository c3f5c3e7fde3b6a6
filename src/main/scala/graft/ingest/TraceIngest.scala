package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.TraceSchema

/** Batch NDJSON trace ingestion (SURVEY.md §2 A5-A7, §1.4).
  *
  * Reference dataflow: pd.read_json(lines=True) → data[columns.keys()] →
  * Time astype(int) (/root/reference/trace-converter.py:115-119). Here the
  * whitelist projection happens *inside* the JSON scan (only declared
  * fields are parsed), and the time rule is the normative one from
  * SURVEY.md §1.4: fractional epoch seconds truncated to whole seconds.
  */
object TraceIngest {

  /** Read rotated NDJSON trace files with the declared raw schema.
    * Schema-on-read without inference: one pass, no sampling job. */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(TraceSchema.raw)
      .option("pathGlobFilter", "*.json")   // A3: suffix filter
      .json(path)

  /** Normalize a raw frame to the target schema:
    *  - Severity → Int (ClickHouse UInt32 has no Spark unsigned analogue;
    *    values are small codes — negativity would indicate corrupt input
    *    and is filtered, SURVEY.md §7.4 risk 6)
    *  - Time: fractional epoch seconds → whole-second timestamp
    *    (cast long truncates toward zero ≡ floor for positive epochs)
    *  - column order exactly as declared. */
  def normalize(raw: DataFrame): DataFrame =
    raw
      .filter(col("Severity").isNotNull && col("Severity") >= 0 &&
              col("Time").isNotNull && col("Machine").isNotNull &&
              col("LogGroup").isNotNull && col("Type").isNotNull)
      .select(
        col("Severity").cast("int").as("Severity"),
        col("Machine"),
        col("LogGroup"),
        col("Time").cast("long").cast("timestamp").as("Time"),
        col("Type"),
        col("ID"))

  /** End-to-end batch ingest of one path (file or directory). */
  def readBatch(spark: SparkSession, path: String): DataFrame =
    normalize(readRaw(spark, path))

  /** Typed view for API consumers. */
  def typed(df: DataFrame): Dataset[TraceSchema.TraceEvent] = {
    import df.sparkSession.implicits._
    df.as[TraceSchema.TraceEvent]
  }

  /** Row serialization to NDJSON / JSONEachRow (A10,
    * trace-converter.py:71) — kept as a tested function so an external
    * HTTP bulk sink could be slotted in (SURVEY.md §7.4 risk 4). */
  def toJsonEachRow(df: DataFrame): Dataset[String] = df.toJSON

  /** Diagnostic summary (A15 — the reference's data.info()):
    * row count + per-column non-null counts, computed in one pass. */
  def summary(df: DataFrame): DataFrame =
    df.select(
      count(lit(1)).as("n_rows") +:
      df.columns.map(c => count(col(c)).as(s"nn_$c")): _*)
}

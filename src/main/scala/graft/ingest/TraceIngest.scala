package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** IPv4 `a.b.c.d[:port]` → numeric (for prefix/range matching). Null on
    * anything that is not a well-formed dotted quad. */
  def ipv4ToLong(ipPort: Column): Column = {
    val ip = split(ipPort, ":").getItem(0)
    val parts = split(ip, "\\.")
    when(ip.rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$"),
      parts.getItem(0).cast("long") * 16777216L +
      parts.getItem(1).cast("long") * 65536L +
      parts.getItem(2).cast("long") * 256L +
      parts.getItem(3).cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  /** Dictionary enrichment by IP block — the reference's own TODO
    * ("dictionaries, IP types", /root/reference/README.md:231-233) in
    * Spark form. `blocks` rows are (cidr_start, cidr_end, payload…) with
    * numeric inclusive bounds; the dictionary is broadcast and the match
    * is a range predicate, so the trace side stays map-only — the B10
    * dimension-join shape with an interval key instead of an equi key.
    * Rows with no matching block (or unparsable machines) keep null
    * payloads (left join). */
  def enrichByIpBlock(traces: DataFrame, blocks: DataFrame): DataFrame = {
    val ipn = ipv4ToLong(col("Machine"))
    traces.withColumn("__ipn", ipn)
      .join(broadcast(blocks),
        col("__ipn") >= col("cidr_start") && col("__ipn") <= col("cidr_end"),
        "left")
      .drop("cidr_start", "cidr_end", "__ipn")
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables

/** Semi-structured / JSON column access (SURVEY.md §2 C5).
  *
  * The reference drops undeclared trace keys at ingest
  * (trace-converter.py:116); the extension keeps them reachable as a JSON
  * string column and provides typed extraction. get_json_object /
  * from_json are codegen'd builtins — the extraction runs inside the scan
  * stage, and Catalyst prunes the struct fields actually referenced.
  */
object JsonProps {

  /** Typed view over a JSON-string column. */
  def typed(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.withColumn("__props", from_json(col(jsonCol), schema))

  // ---------------------------------------------------------------- C5
  /** Extract props.k per event, aggregate per event_type. */
  def q36JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"), min(col("k")).as("min_k"),
           max(col("k")).as("max_k"), round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  val q36Sql: String =
    """SELECT event_type, count(k) AS n_k, min(k) AS min_k, max(k) AS max_k,
      |  round(avg(k), 4) AS avg_k
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Structured from_json extraction filtered on the typed field —
    * demonstrates schema-on-read with predicate on the extracted value. */
  def q37JsonFilter(s: SparkSession, dir: String): DataFrame =
    typed(Tables.events(s, dir), "props", StructType(Seq(StructField("k", IntegerType))))
      .filter(col("__props.k") >= 90)
      .select(col("event_id"), col("event_type"), col("__props.k").as("k"))
      .orderBy(col("event_id"))

  val q37Sql: String =
    """SELECT event_id, event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
      |FROM events WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 90
      |ORDER BY event_id""".stripMargin

  /** Semi-structured access through Spark 4's VARIANT type (parse once,
    * typed extraction from the binary-encoded value) — the modern path
    * for schema-flexible props columns, vs q36's per-access string
    * re-parse via get_json_object. Aggregates k into coarse buckets. */
  def q66Variant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'int')"))
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      // pin NULL placement: a props payload without 'k' makes k_bucket
      // NULL, and Spark defaults NULLS FIRST where DuckDB defaults NULLS
      // LAST — positional compare would break on schema-flexible data
      .orderBy(col("k_bucket").asc_nulls_last)

  val q66Sql: String =
    """SELECT json_extract(props, '$.k')::INT // 10 AS k_bucket,
      |  count(*) AS n, min(json_extract(props, '$.k')::INT) AS min_k,
      |  max(json_extract(props, '$.k')::INT) AS max_k
      |FROM events GROUP BY k_bucket ORDER BY k_bucket NULLS LAST""".stripMargin

  /** MapType column surface (SURVEY §1.3's "raw extras map" / §2 map
    * scalar fns): parse the JSON props into a map<string,long> — the
    * schema-free form for undeclared keys — then explode entries and
    * aggregate per key. from_json(MapType) + explode(map) is the pattern
    * that keeps unknown-schema payloads queryable without widening the
    * declared whitelist; all map functions stay codegen'd.
    *
    * Oracle contract: props keys are simple identifiers and values are
    * integral (the trace-props shape). A key containing JSON-path
    * metacharacters ('.', '[') or a non-integer value would diverge —
    * the DuckDB twin addresses by '$.'||key path and casts ::BIGINT,
    * while Spark's PERMISSIVE from_json nulls the whole map. */
  def q88MapProps(s: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), MapType(StringType, LongType))
    graft.tables.Tables.events(s, dir)
      .select(m.as("m"))
      .select(size(col("m")).as("n_keys"), explode(col("m")).as(Seq("key", "v")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), max(col("n_keys")).as("max_keys"),
        sum(col("v")).as("sv"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("key"))
  }

  val q88Sql: String =
    """WITH kv AS (SELECT unnest(json_keys(props)) AS key,
      |              len(json_keys(props)) AS n_keys, props FROM events),
      |vals AS (SELECT key, n_keys,
      |           json_extract(props, '$.' || key)::BIGINT AS v FROM kv)
      |SELECT key, count(*) AS n, max(n_keys) AS max_keys,
      |       sum(v)::BIGINT AS sv, min(v) AS mn, max(v) AS mx
      |FROM vals GROUP BY key ORDER BY key""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q36_json_extract", q36JsonExtract _, Some(q36Sql)),
    ("q37_json_filter",  q37JsonFilter _,  Some(q37Sql)),
    ("q66_variant",      q66Variant _,     Some(q66Sql)),
    ("q88_map_props",    q88MapProps _,    Some(q88Sql)),
  )
}

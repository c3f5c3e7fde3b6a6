package graft.schema

/** DDL generation (SURVEY.md §2 A8-A9, entry points E2/E3).
  *
  * Renders the same CREATE TABLE the reference prints for
  * `--print-schema` (/root/reference/trace-converter.py:20-54; golden
  * output /root/reference/README.md:118-134), plus the Spark-native DDL
  * this engine actually executes. Both are pure functions of
  * [[TraceSchema.columns]] — golden-testable (the one de-facto test the
  * reference has, SURVEY.md §5.1).
  */
object Ddl {

  val IndexGranularity = 8192
  val PartitionExpr = "toYYYYMM(Time)"
  val OrderBy = "(Time)"

  /** ClickHouse-dialect DDL, byte-compatible with the reference's
    * `--print-schema` output format. */
  def clickhouse(table: String): String = {
    val rows = TraceSchema.columns.zipWithIndex.map { case (c, i) =>
      val lead = if (i == 0) "  ( " else "  , "
      f"$lead${s"`${c.name}`"}%-14s ${c.chType}%-18s COMMENT ${s"'${c.comment}'"}%-20s ${c.codec}"
    }
    s"""CREATE TABLE IF NOT EXISTS `$table`
       |${rows.mkString("\n")}
       |  ) ENGINE = MergeTree()
       |    PARTITION BY
       |      $PartitionExpr
       |    ORDER BY
       |      $OrderBy
       |    SETTINGS
       |      index_granularity=$IndexGranularity""".stripMargin
  }

  /** Spark SQL DDL for the native store: parquet + zstd, Hive-style month
    * partitions (the pruning analogue of PARTITION BY toYYYYMM, SURVEY.md
    * §1.5). */
  def spark(db: String, table: String, location: Option[String] = None): Seq[String] = {
    val cols = TraceSchema.columns
      .map(c => s"  ${c.name} ${c.spark.sql} COMMENT '${c.comment}'")
      .mkString(",\n")
    val loc = location.map(p => s"\nLOCATION '$p'").getOrElse("")
    Seq(
      s"CREATE DATABASE IF NOT EXISTS $db",
      s"""CREATE TABLE IF NOT EXISTS $db.$table (
         |$cols,
         |  ${TraceSchema.PartitionCol} STRING COMMENT 'yyyyMM of Time'
         |) USING parquet
         |PARTITIONED BY (${TraceSchema.PartitionCol})
         |TBLPROPERTIES ('parquet.compression' = 'zstd')$loc""".stripMargin,
    )
  }

  /** Idempotent bootstrap (E3): CREATE DATABASE + CREATE TABLE in the
    * session catalog, mirroring create_schema
    * (/root/reference/trace-converter.py:58-61). */
  def createSchema(spark0: org.apache.spark.sql.SparkSession, db: String,
                   table: String, location: Option[String] = None): Unit =
    spark(db, table, location).foreach(spark0.sql(_))
}

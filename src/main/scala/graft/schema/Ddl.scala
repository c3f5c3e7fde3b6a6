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
    * `--print-schema` output format. `micros = true` renders the
    * sub-second variant the reference's TODO considered
    * (/root/reference/README.md:219-225): `Time` as `DateTime64(6)` —
    * the modern ClickHouse answer to that TODO, paired with
    * [[graft.ingest.TraceIngest.TimeResolution.Micros]] ingest. */
  def clickhouse(table: String, micros: Boolean = false): String = {
    val rows = TraceSchema.columns.zipWithIndex.map { case (c, i) =>
      val lead = if (i == 0) "  ( " else "  , "
      val chType = if (micros && c.name == "Time") "DateTime64(6)" else c.chType
      f"$lead${s"`${c.name}`"}%-14s $chType%-18s COMMENT ${s"'${c.comment}'"}%-20s ${c.codec}"
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
    * §1.5). `schema` defaults to the base whitelist; pass a store's
    * evolved schema to render its current shape. */
  def spark(db: String, table: String, location: Option[String] = None,
            schema: org.apache.spark.sql.types.StructType = TraceSchema.target): Seq[String] = {
    val comments = TraceSchema.columns.map(c => c.name -> c.comment).toMap
    val cols = schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}" +
        comments.get(f.name).map(c => s" COMMENT '$c'").getOrElse(""))
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
    * (/root/reference/trace-converter.py:58-61). When `location` holds
    * an existing store, the table is created with its CURRENT (evolved)
    * schema, and a previously-registered table whose columns drifted
    * from it (a --create-schema re-run after --evolve-schema) is dropped
    * and re-registered — CREATE IF NOT EXISTS alone would silently keep
    * the stale pre-evolution DDL while path-based reads see the evolved
    * column. External-table drop is metadata-only; files are untouched. */
  def createSchema(spark0: org.apache.spark.sql.SparkSession, db: String,
                   table: String, location: Option[String] = None): Unit = {
    val schema = location match {
      case Some(p) if java.nio.file.Files.exists(java.nio.file.Paths.get(p)) =>
        graft.store.TraceStore.storedSchema(p)
      case _ => TraceSchema.target
    }
    spark0.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val storeExists = location.exists(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    // a store with rename history needs registerCatalog's files-table +
    // coalescing-view shape (a plain catalog table would NULL pre-rename
    // values). A NO-rename store keeps the comment-bearing, zstd-
    // TBLPROPERTIES DDL below — registerCatalog's bare DDL would drop
    // both — but an EXISTING store still needs partition recovery after
    // the CREATE (a partitioned external table registered without MSCK
    // reads ZERO rows; the CLI bootstrap hit exactly that).
    location match {
      case Some(p) if storeExists && graft.store.TraceStore.hasRenameAliases(p) =>
        graft.store.TraceStore.registerCatalog(spark0, p, s"$db.$table")
        return
      case _ => ()
    }
    if (spark0.catalog.tableExists(s"$db.$table")) {
      val have = spark0.table(s"$db.$table").schema
        .fields.map(f => (f.name, f.dataType)).toSeq
      val want = schema.fields.map(f =>
        (f.name, f.dataType): (String, org.apache.spark.sql.types.DataType)).toSeq :+
        ((TraceSchema.PartitionCol,
          org.apache.spark.sql.types.StringType: org.apache.spark.sql.types.DataType))
      if (have != want) spark0.sql(s"DROP TABLE $db.$table")
    }
    spark(db, table, location, schema).foreach(spark0.sql(_))
    if (storeExists) spark0.sql(s"MSCK REPAIR TABLE $db.$table")
  }
}

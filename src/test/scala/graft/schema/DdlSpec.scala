package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Golden DDL test (SURVEY.md §5.2 item 1) — the one de-facto test the
  * reference has is its --print-schema output
  * (/root/reference/README.md:111-134). */
class DdlSpec extends AnyFunSuite {

  test("clickhouse DDL matches the golden --print-schema shape") {
    val got = Ddl.clickhouse("cluster01")
    val expected =
      """CREATE TABLE IF NOT EXISTS `cluster01`
        |  ( `Severity`     UInt32             COMMENT 'Event Severity Code' CODEC(Delta, ZSTD)
        |  , `Machine`      String             COMMENT 'Machine ID for Event' CODEC(ZSTD)
        |  , `LogGroup`     String             COMMENT 'Group for Event Type' CODEC(ZSTD)
        |  , `Time`         DateTime           COMMENT 'Event Timestamp'    CODEC(ZSTD)
        |  , `Type`         String             COMMENT 'Event Type'         CODEC(ZSTD)
        |  , `ID`           Nullable(String)   COMMENT 'Event Identifier'   CODEC(ZSTD)
        |  ) ENGINE = MergeTree()
        |    PARTITION BY
        |      toYYYYMM(Time)
        |    ORDER BY
        |      (Time)
        |    SETTINGS
        |      index_granularity=8192""".stripMargin
    assert(got == expected)
  }

  test("clickhouse DDL micros variant renders Time as DateTime64(6), all else identical") {
    // the reference TODO's sub-second mode (README.md:219-225), paired
    // with TimeResolution.Micros ingest — only the Time type changes
    val got = Ddl.clickhouse("cluster01", micros = true)
    val expected =
      """CREATE TABLE IF NOT EXISTS `cluster01`
        |  ( `Severity`     UInt32             COMMENT 'Event Severity Code' CODEC(Delta, ZSTD)
        |  , `Machine`      String             COMMENT 'Machine ID for Event' CODEC(ZSTD)
        |  , `LogGroup`     String             COMMENT 'Group for Event Type' CODEC(ZSTD)
        |  , `Time`         DateTime64(6)      COMMENT 'Event Timestamp'    CODEC(ZSTD)
        |  , `Type`         String             COMMENT 'Event Type'         CODEC(ZSTD)
        |  , `ID`           Nullable(String)   COMMENT 'Event Identifier'   CODEC(ZSTD)
        |  ) ENGINE = MergeTree()
        |    PARTITION BY
        |      toYYYYMM(Time)
        |    ORDER BY
        |      (Time)
        |    SETTINGS
        |      index_granularity=8192""".stripMargin
    assert(got == expected)
  }

  test("spark DDL declares all columns plus the ym partition") {
    val stmts = Ddl.spark("fdb", "traces")
    assert(stmts.head == "CREATE DATABASE IF NOT EXISTS fdb")
    val ddl = stmts(1)
    TraceSchema.columns.foreach(c => assert(ddl.contains(c.name)))
    assert(ddl.contains("PARTITIONED BY (ym)"))
    assert(ddl.contains("USING parquet"))
  }
}

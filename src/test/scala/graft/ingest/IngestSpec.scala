package graft.ingest

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.schema.TraceSchema

/** Pins SURVEY.md §1.4 time semantics + A6 projection + nullable ID. */
class IngestSpec extends SparkSpec {

  private def writeFixture(dir: String): Unit = {
    // Extra keys (As/Transition/Locality) must be dropped; one line lacks ID.
    val lines = Seq(
      """{"Severity": 10, "Machine": "127.0.0.1:4500", "LogGroup": "default", "Time": 1557761852.941, "Type": "Role", "ID": "92f2ac1d4ebb1f2d", "As": "MasterServer", "Transition": "Begin"}""",
      """{"Severity": 20, "Machine": "127.0.0.1:4501", "LogGroup": "default", "Time": 1557761853.499, "Type": "MachineMetrics", "Locality": "zz"}""",
      """{"Severity": 40, "Machine": "127.0.0.1:4502", "LogGroup": "g2", "Time": 1557761854.0, "Type": "Net2SlowTaskTrace", "ID": "0000000000000001"}""",
    )
    Files.write(Paths.get(dir, "trace.127.0.0.1.4500.1.2.json"),
      lines.mkString("\n").getBytes)
    // non-.json files must be ignored (A3)
    Files.write(Paths.get(dir, "trace.partial.tmp"), "garbage".getBytes)
  }

  test("batch ingest: projection, time truncation, nullability") {
    val dir = tmpDir("ingest")
    writeFixture(dir)
    val df = TraceIngest.readBatch(spark, dir)
    // JSON sources always report nullable fields; the target's declared
    // non-nullability is enforced by normalize's filters, checked below.
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
           TraceSchema.target.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.filter(
      df.col("Severity").isNull || df.col("Machine").isNull ||
      df.col("Time").isNull || df.col("Type").isNull).count() == 0)
    val rows = df.orderBy("Time").collect()
    assert(rows.length == 3)
    // §1.4: fractional seconds truncate toward zero (1557761852.941 → ...52)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    assert(fmt.format(rows(0).getTimestamp(3)) == "2019-05-13 15:37:32")
    assert(fmt.format(rows(1).getTimestamp(3)) == "2019-05-13 15:37:33")
    // ID nullable: second line had none
    assert(rows(1).isNullAt(5))
    assert(rows(0).getString(5) == "92f2ac1d4ebb1f2d")
  }

  test("micros mode keeps sub-second time exactly; default stays whole-second") {
    val dir = tmpDir("ingest-us")
    writeFixture(dir)
    val df = TraceIngest.readBatch(spark, dir, TraceIngest.TimeResolution.Micros)
    val us = df.orderBy("Time")
      .select(org.apache.spark.sql.functions.unix_micros(df.col("Time")))
      .collect().map(_.getLong(0))
    // 1557761852.941 / .499 / .0 — micros preserved, round-to-nearest
    // (truncation would read the doubles' representation error as ±1 µs)
    assert(us.toSeq == Seq(1557761852941000L, 1557761853499000L, 1557761854000000L))
    // and the same fixture through the DEFAULT path still truncates (§1.4)
    val secs = TraceIngest.readBatch(spark, dir).orderBy("Time")
      .select(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("Time")))
      .collect().map(_.getLong(0))
    assert(secs.toSeq == Seq(1557761852000000L, 1557761853000000L, 1557761854000000L))
  }

  test("micros timestamps survive the STORE round-trip (append, ym layout, read)") {
    val dir = tmpDir("ingest-us-store"); val table = tmpDir("ingest-us-table")
    writeFixture(dir)
    graft.store.TraceStore.append(
      TraceIngest.readBatch(spark, dir, TraceIngest.TimeResolution.Micros), table)
    // parquet stores Spark timestamps at microsecond physical precision,
    // so nothing truncates at rest; the month layout derives identically
    val back = graft.store.TraceStore.read(spark, table)
    assert(back.select("ym").distinct().collect().map(_.getString(0)).toSeq == Seq("201905"))
    val us = back.orderBy("Time")
      .select(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("Time")))
      .collect().map(_.getLong(0))
    assert(us.toSeq == Seq(1557761852941000L, 1557761853499000L, 1557761854000000L))
  }

  test("toJsonEachRow round-trips the declared schema") {
    val dir = tmpDir("ingest2")
    writeFixture(dir)
    val df = TraceIngest.readBatch(spark, dir)
    val json = TraceIngest.toJsonEachRow(df).collect()
    assert(json.length == 3)
    assert(json.forall(_.contains("\"Severity\":")))
  }

  test("summary counts rows and non-nulls per column") {
    val dir = tmpDir("ingest3")
    writeFixture(dir)
    val s = TraceIngest.summary(TraceIngest.readBatch(spark, dir)).collect()(0)
    assert(s.getLong(s.fieldIndex("n_rows")) == 3)
    assert(s.getLong(s.fieldIndex("nn_ID")) == 2)
    assert(s.getLong(s.fieldIndex("nn_Machine")) == 3)
  }

  test("ip-block dictionary enrichment tags machines, leaves strays null") {
    import spark.implicits._
    val traces = Seq("10.0.1.5:4500", "10.0.2.9:4500", "192.168.0.1:1",
      "not-an-ip", "10.0.2.300:1").toDF("Machine")
    val base = 10L * 16777216
    // nested dictionary: /16 dc + two /24 racks inside it
    val blocks = Seq(
      (base, base + 65535L, "dc-west"),
      (base + 1 * 256L, base + 1 * 256L + 255L, "rack-a"),
      (base + 2 * 256L, base + 2 * 256L + 255L, "rack-b"),
    ).toDF("cidr_start", "cidr_end", "rack")
    val enriched = TraceIngest.enrichByIpBlock(traces, blocks)
    val got = enriched.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(enriched.count() == 5)                    // overlap must not duplicate rows
    assert(got("10.0.1.5:4500") == Some("rack-a"))   // most specific wins over dc-west
    assert(got("10.0.2.9:4500") == Some("rack-b"))
    assert(got("192.168.0.1:1") == None)
    assert(got("not-an-ip") == None)
    assert(got("10.0.2.300:1") == None)              // octet > 255 must not alias 10.0.3.44
    // the prefix equi-join keeps the dictionary probe a broadcast HASH join
    val plan = enriched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}

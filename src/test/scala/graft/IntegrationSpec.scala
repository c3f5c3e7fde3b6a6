package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.store.TraceStore
import graft.streaming.TraceStream

/** Full-pipeline closure: rotated NDJSON across two months → streaming
  * ingest → partitioned store → pruned OLAP query (the Tier A dataflow
  * feeding the Tier B query surface, SURVEY.md §0 halves (a)+(b)). */
class IntegrationSpec extends SparkSpec {

  test("ingest → store → month-pruned aggregate returns exact counts") {
    val watch = tmpDir("iwatch"); val table = tmpDir("itable"); val ckpt = tmpDir("ickpt")
    // May 2019 file: 40 Role + 20 Metrics; June file: 10 Role
    def lines(t0: Long, n: Int, typ: String) = (0 until n).map { i =>
      s"""{"Severity": 10, "Machine": "m", "LogGroup": "g", "Time": ${t0 + i}.5, "Type": "$typ", "ID": "x$i"}"""
    }
    Files.write(Paths.get(watch, "trace.may.json"),
      (lines(1557761852L, 40, "Role") ++ lines(1557761952L, 20, "Metrics"))
        .mkString("\n").getBytes)
    Files.write(Paths.get(watch, "trace.june.json"),
      lines(1559741852L, 10, "Role").mkString("\n").getBytes)

    val q = TraceStream.start(spark, TraceStream.Config(watch, table, ckpt))
    q.awaitTermination()

    val may = TraceStore.timeRange(spark, table,
      java.sql.Timestamp.valueOf("2019-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2019-06-01 00:00:00"))
      .groupBy(col("Type")).agg(count(lit(1)).as("n"))
      .orderBy(col("Type")).collect()
    assert(may.map(r => (r.getString(0), r.getLong(1))).toSeq ==
           Seq(("Metrics", 20L), ("Role", 40L)))

    val all = TraceStore.read(spark, table)
    assert(all.count() == 70)
    assert(all.select(col("ym")).distinct().collect().map(_.getString(0)).sorted.toSeq ==
           Seq("201905", "201906"))
  }

  test("live rotation + sentinel stop feeds three Tier B query shapes (README walkthrough)") {
    // The reference's full lifecycle (entrypoint.sh:18-29) run natively:
    // files rotate into the watch dir WHILE the stream is live, the
    // sim-completed sentinel ends the run, and the partitioned store then
    // serves the Tier B query surface. Mirrors README.md's walkthrough.
    val watch = tmpDir("lwatch"); val table = tmpDir("ltable"); val ckpt = tmpDir("lckpt")
    def lines(t0: Long, n: Int, typ: String, mach: String, sev: Int) =
      (0 until n).map { i =>
        s"""{"Severity": $sev, "Machine": "$mach", "LogGroup": "g", "Time": ${t0 + i}.25, "Type": "$typ", "ID": "i$i"}"""
      }
    // rotation 1 exists before the stream starts: 30 May Role on m1
    Files.write(Paths.get(watch, "trace.0.json"),
      lines(1557761852L, 30, "Role", "m1", 10).mkString("\n").getBytes)

    val q = TraceStream.start(spark, TraceStream.Config(watch, table, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds")))
    try {
      q.processAllAvailable()
      assert(TraceStore.read(spark, table).count() == 30)

      // rotation 2 lands while the query is LIVE: 12 May Metrics on m2
      // (one hour later) + 8 June Role on m2
      Files.write(Paths.get(watch, "trace.1.json"),
        (lines(1557765852L, 12, "Metrics", "m2", 20) ++
         lines(1559741852L, 8, "Role", "m2", 30)).mkString("\n").getBytes)
      q.processAllAvailable()
      assert(TraceStore.read(spark, table).count() == 50)
    } finally {
      // A4: the sentinel (not matching *.json, so never ingested) ends the run
      Files.createFile(Paths.get(watch, "sim-completed"))
      TraceStream.runUntilSentinel(q, Paths.get(watch, "sim-completed"))
      assert(!q.isActive)
    }

    // B1 — time-range scan with partition pruning: May only
    val may = TraceStore.timeRange(spark, table,
      java.sql.Timestamp.valueOf("2019-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2019-06-01 00:00:00"))
      .groupBy(col("Type")).agg(count(lit(1)).as("n"))
      .orderBy(col("Type")).collect()
    assert(may.map(r => (r.getString(0), r.getLong(1))).toSeq ==
           Seq(("Metrics", 12L), ("Role", 30L)))

    // B5 + B8 — hash aggregation then top-N: machines by volume
    val top = TraceStore.read(spark, table)
      .groupBy(col("Machine"))
      .agg(count(lit(1)).as("n"), avg(col("Severity")).as("avg_sev"))
      .orderBy(col("n").desc).limit(1).collect()(0)
    assert(top.getString(0) == "m1" && top.getLong(1) == 30L &&
           top.getDouble(2) == 10.0)

    // B7 — tumbling hourly window over the stored events (UTC session)
    val hourly = TraceStore.read(spark, table)
      .groupBy(window(col("Time"), "1 hour"), col("Type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("h"), col("Type"), col("n"))
      .orderBy(col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(hourly == Seq(
      (1557759600L, "Role", 30L),      // 2019-05-13 13:00 UTC
      (1557763200L, "Metrics", 12L),   // 2019-05-13 14:00 UTC
      (1559739600L, "Role", 8L)))      // 2019-06-05 13:00 UTC
  }
}

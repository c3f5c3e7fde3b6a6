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
}

package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.ingest.TraceIngest
import graft.store.TraceStore
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val watch = Files.createTempDirectory("ip-watch").toString
    val types = Array("Role", "MachineMetrics", "ProcessMetrics", "Net2SlowTaskTrace")
    (0 until 20).foreach { f =>
      val sb = new StringBuilder(25000 * 150)
      var i = 0
      while (i < 25000) {
        val t = 1557700000 + f * 100000 + i
        sb.append(s"""{"Severity": ${(i % 4 + 1) * 10}, "Machine": "10.0.0.${f % 250}:4500", "LogGroup": "default", "Time": $t.${i % 997}, "Type": "${types(i % 4)}", "ID": "${f}x$i"}""").append('\n')
        i += 1
      }
      Files.write(Paths.get(watch, s"trace.$f.json"), sb.toString.getBytes)
    }
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    time("batch read+normalize+count")(TraceIngest.readBatch(spark, watch).count())
    time("batch read+normalize+count again")(TraceIngest.readBatch(spark, watch).count())
    val table1 = Files.createTempDirectory("ip-t1").toString
    time("append splits=8")(TraceStore.append(TraceIngest.readBatch(spark, watch), table1, 8))
    val table1b = Files.createTempDirectory("ip-t1b").toString
    time("append splits=32")(TraceStore.append(TraceIngest.readBatch(spark, watch), table1b, 32))
    locally {
      import org.apache.spark.sql.functions._
      val df = TraceIngest.readBatch(spark, watch)
        .withColumn("ym", date_format(col("Time"), "yyyyMM"))
      val d1 = Files.createTempDirectory("ip-ns").toString
      time("write nosort nopart zstd")(df.write.mode("append").option("compression","zstd").parquet(d1))
      val d2 = Files.createTempDirectory("ip-ns2").toString
      time("write nosort partitionBy zstd")(df.write.mode("append").option("compression","zstd").partitionBy("ym").parquet(d2))
      val d3 = Files.createTempDirectory("ip-ns3").toString
      time("write nosort partitionBy snappy")(df.write.mode("append").partitionBy("ym").parquet(d3))
      val d4 = Files.createTempDirectory("ip-ns4").toString
      time("repart+sort+partitionBy zstd (splits8)") {
        df.repartition(col("ym"), pmod(xxhash64(col("Time")), lit(8L)))
          .sortWithinPartitions(col("Time"))
          .write.mode("append").option("compression","zstd").partitionBy("ym").parquet(d4)
      }
    }
    val table2 = Files.createTempDirectory("ip-t2").toString
    val ckpt = Files.createTempDirectory("ip-ck").toString
    time("streaming end-to-end") {
      val q = graft.streaming.TraceStream.start(spark,
        graft.streaming.TraceStream.Config(watch, table2, ckpt, maxFilesPerTrigger = 20))
      q.awaitTermination()
    }
    spark.stop()
  }
}

package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.streaming.TraceStream

/** Ingest throughput benchmark for the Tier A dataflow: N rotated trace
  * files (sized like the reference's observed 25,810-row file,
  * /root/reference/README.md:79-80) → streaming micro-batch ingest →
  * partitioned store. Prints rows/sec for the full pipeline (parse +
  * normalize + partitioned zstd write + checkpoint commit). */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(20)
    val rowsPerFile = args.lift(1).map(_.toInt).getOrElse(25000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val watch = Files.createTempDirectory("ibench-watch").toString
    val table = Files.createTempDirectory("ibench-table").toString
    val ckpt = Files.createTempDirectory("ibench-ckpt").toString

    val types = Array("Role", "MachineMetrics", "ProcessMetrics", "Net2SlowTaskTrace")
    (0 until nFiles).foreach { f =>
      val sb = new StringBuilder(rowsPerFile * 150)
      var i = 0
      while (i < rowsPerFile) {
        val t = 1557700000 + f * 100000 + i
        sb.append(s"""{"Severity": ${(i % 4 + 1) * 10}, "Machine": "10.0.0.${f % 250}:4500", "LogGroup": "default", "Time": $t.${i % 997}, "Type": "${types(i % 4)}", "ID": "${f}x$i"}""")
          .append('\n')
        i += 1
      }
      Files.write(Paths.get(watch, s"trace.10.0.0.$f.4500.$f.json"),
        sb.toString.getBytes)
    }

    // Untimed warmup on synthetic data: the first JSON parse and first
    // parquet-sort-write in a JVM pay ~2.5 s of JIT/codegen; a pipeline
    // ingesting rotated files runs warm, so the steady-state rate is the
    // meaningful number (cold-start is one rotation period, once).
    locally {
      val wdir = Files.createTempDirectory("ibench-warm").toString
      Files.write(Paths.get(wdir, "w.json"),
        (0 until 2000).map(i =>
          s"""{"Severity": 10, "Machine": "w", "LogGroup": "g", "Time": $i.5, "Type": "W", "ID": "w$i"}""")
          .mkString("\n").getBytes)
      val wtab = Files.createTempDirectory("ibench-warmtab").toString
      graft.store.TraceStore.append(
        graft.ingest.TraceIngest.readBatch(spark, wdir), wtab, 8)
    }

    val total = nFiles.toLong * rowsPerFile
    val t0 = System.nanoTime()
    val q = TraceStream.start(spark,
      TraceStream.Config(watch, table, ckpt, maxFilesPerTrigger = nFiles))
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val stored = spark.read.parquet(table).count()
    require(stored == total, s"stored $stored != $total")
    println(f"""{"metric":"ingest_rows_per_sec","value":${total / secs}%.0f,"rows":$total,"sec":$secs%.2f,"files":$nFiles}""")
    spark.stop()
  }
}

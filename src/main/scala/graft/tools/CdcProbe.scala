package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.TraceStore

/** Scale probe for the `graft-cdc` streaming source — measures the two
  * claims the 100 TB design rests on, as numbers rather than arguments:
  *
  *  1. '''Bootstrap is bounded''': with `maxFilesPerTrigger`, the
  *     initial load arrives as manifest slices whose per-batch row count
  *     is set by the chunk size, NOT by the table — a 10× table means
  *     ~10× more chunks of the same size, never a 10× batch.
  *  2. '''Incremental cost tracks the CHANGES, not the table''': after
  *     the bootstrap, delivering a FIXED-size append costs the same on a
  *     1× store and a 10× store (file-set pruning: the untouched bulk
  *     never appears in the micro-batch's plan).
  *
  * Store shape mirrors ScaleProbe's replication (shifted entity ids over
  * the same calendar). The probe prints one JSON line per scale:
  * bootstrap wall time + chunk census (count, max rows), then the
  * fixed-increment wall time + rows. Run on a quiet machine; the
  * AvailableNow harness start/stop (~1 s) rides every number equally.
  *
  * Usage: runMain graft.tools.CdcProbe [K[,K2,…]]   (default 1,10)
  */
object CdcProbe {

  // the same events→trace mapping as the oracle-gated queries, so the
  // probe's store shape can never drift from theirs
  private def asTrace(ev: DataFrame): DataFrame =
    graft.store.ChangeFeedQuery.asTrace(ev)

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 10))
    val base = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // at probe scale AQE would coalesce the write splits down to 1-2
      // files per append and there would be nothing to chunk; a real
      // store's files are batch-sized by the ingest cadence, which is
      // the layout this probe emulates
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.tables.Tables.events(spark, base)

    // the fixed increment: the same absolute rows at every scale (1/64th
    // of the BASE events, ids shifted clear of every replica range)
    val incr = asTrace(ev.filter(pmod(col("event_id"), lit(64L)) === 0)
      .withColumn("event_id", col("event_id") + lit(900L * 1000000000L)))

    val lines = ks.map { k =>
      val store = graft.util.TmpDirs.scratch(s"cdcprobe-store-x$k")
      // one commit per replica at ingest-like write splits: the store's
      // file count grows with the data (the shape a micro-batched ingest
      // actually leaves), so the chunked bootstrap has files to chunk
      (0 until k).foreach { c =>
        TraceStore.append(asTrace(ev
          .withColumn("event_id", col("event_id") + lit(c.toLong * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(c.toLong * 1000000000L))),
          store, splitsPerMonth = 16)
      }
      val nFiles = TraceStore.snapshotFileCount(store, TraceStore.snapshot(store))

      // chunked bootstrap under a CONTINUOUS query: chunks flow
      // back-to-back inside one run; census per batch
      val batchRows = scala.collection.mutable.ArrayBuffer[Long]()
      val sink: (DataFrame, Long) => Unit = (df, _) => { batchRows += df.count(); () }
      val q = spark.readStream.format("graft-cdc")
        .option("path", store)
        .option("initialLoad", "true")
        .option("maxFilesPerTrigger", "8")
        .load()
        .writeStream
        .option("checkpointLocation", graft.util.TmpDirs.scratch(s"cdcprobe-ck-x$k"))
        .foreachBatch(sink)
        .start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val bootS = (System.nanoTime() - t0) / 1e9
      val (nChunks, maxChunk) = (batchRows.size, batchRows.max)

      // fixed-size increment on the SAME running stream: this wall time
      // must be ~flat across k (pruned to the appended files only)
      batchRows.clear()
      TraceStore.append(incr, store, splitsPerMonth = 4)
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val incS = (System.nanoTime() - t1) / 1e9
      q.stop()
      val incRows = batchRows.sum

      val line = f""""x$k":{"files":$nFiles,"bootstrap_s":$bootS%.2f,""" +
        f""""chunks":$nChunks,"max_chunk_rows":$maxChunk,""" +
        f""""incr_s":$incS%.2f,"incr_rows":$incRows}"""
      System.err.println(s"[cdcprobe] $line")
      line
    }
    println(lines.mkString("""{"metric":"cdc_probe","chunk_files":8,""", ",", "}"))
    spark.stop()
  }
}

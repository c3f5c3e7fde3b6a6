package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ingest.TraceIngest
import graft.schema.TraceSchema
import graft.store.TraceStore

/** Structured-Streaming ingest (SURVEY.md §2 A1-A4, A11, A13; §3 E1).
  *
  * The reference's pipeline — inotifywait on close_write → one python
  * process per rotated file → HTTP INSERT → delete on success
  * (/root/reference/entrypoint.sh:18-29,
  * /root/reference/trace-converter.py:109-130) — maps onto the file
  * source's contract: a newly visible file is a new unit of data, each
  * micro-batch is delivered at-least-once under checkpoint bookkeeping,
  * and the ingest sink adds per-batch markers so a replayed delivery is
  * skipped (effectively-once up to a crash in the commit→marker window —
  * still at least as strong as the reference's at-least-once manual
  * delete; see [[start]]).
  *
  * Scale: file listing is driver-side but incremental (maxFilesPerTrigger
  * bounds a batch); parse/normalize run on executors; the sink append
  * partitions by month so a year of backlog still lands as 12 directories
  * with batch-sized files.
  */
object TraceStream {

  final case class Config(
    watchDir: String,
    tablePath: String,
    checkpointDir: String,
    maxFilesPerTrigger: Int = 64,
    deleteOnSuccess: Boolean = false,   // A13: the reference's --delete-logs
    trigger: Trigger = Trigger.AvailableNow(),
    /** Write parallelism per month partition. A micro-batch of rotated
      * files usually lands in 1–2 months, so the store default of 1 would
      * serialize the whole batch's sort+zstd+write onto one core; a few
      * splits keep the commit parallel while files stay batch-sized (the
      * small-file/small-insert contract still holds: ≤ splits files per
      * month per commit). */
    splitsPerMonth: Int = 8)

  /** Streaming source over the watched directory (A1): new rotated
    * *.json files become micro-batch input. */
  def source(spark: SparkSession, cfg: Config): DataFrame =
    spark.readStream
      .schema(TraceSchema.raw)
      .option("pathGlobFilter", "*.json")            // A3 suffix filter
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .option("cleanSource", if (cfg.deleteOnSuccess) "delete" else "off")
      .json(cfg.watchDir)

  /** Deterministic key for one checkpoint lineage: replays within the
    * same checkpoint share batch-id meaning; a NEW checkpoint restarts
    * ids at 0, so markers from a previous incarnation must never
    * suppress (ingest) or silently skip (rollup) the new one's batches. */
  private[streaming] def incarnationOf(checkpointDir: String): String = {
    val abs = java.nio.file.Paths.get(checkpointDir).toAbsolutePath.toString
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Full ingest query: source → normalize → partitioned store append.
    * foreachBatch gives the same commit unit as the reference's
    * one-file-one-INSERT (A11) while keeping the store writer shared with
    * the batch path.
    *
    * Replay handling: foreachBatch is at-least-once, and
    * `TraceStore.append` is a plain parquet append — so a replayed batch
    * would land TWICE without a guard. A per-(incarnation, batchId)
    * marker under `_ingest_batches/` is written after each successful
    * append and skips the re-delivery. The marker follows the append, so
    * a crash in the tiny window between commit and marker can still
    * duplicate one batch (at-least-once, never loss); byte-atomic
    * batch publish is the DSv2 `graft-ndjson` sink's job
    * (per-task atomic publish + batch markers). */
  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    val inc = incarnationOf(cfg.checkpointDir)
    TraceIngest.normalize(source(spark, cfg))
      .writeStream
      .queryName("trace-ingest")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = java.nio.file.Paths.get(cfg.tablePath, "_ingest_batches",
          inc, s"v$batchId")
        if (!java.nio.file.Files.exists(marker)) {
          TraceStore.append(batch, cfg.tablePath, cfg.splitsPerMonth)
          java.nio.file.Files.createDirectories(marker.getParent)
          java.nio.file.Files.createFile(marker)
          ()
        }
      }
      .start()
  }

  /** Sentinel-file shutdown (A4): the reference exits its watch loop when
    * `sim-completed` appears (/root/reference/entrypoint.sh:22-24). Polls
    * between micro-batches; returns when stopped. */
  def runUntilSentinel(q: StreamingQuery, sentinel: java.nio.file.Path,
                       pollMillis: Long = 500): Unit = {
    while (q.isActive && !java.nio.file.Files.exists(sentinel)) {
      q.awaitTermination(pollMillis)
    }
    if (q.isActive) q.stop()
    q.awaitTermination()
  }

  /** Stream-static dimension enrichment (B10 in streaming form — the
    * reference's "dictionaries" TODO applied at ingest time): the
    * normalized stream left-joined against a static broadcast dictionary
    * inside the streaming query. Stateless — unlike stream-stream joins
    * (StatefulOps.intervalJoin) no watermark or join state is held; the
    * static side is re-resolved per micro-batch, so a dictionary loaded
    * through a catalog view picks up refreshes on the next batch. */
  def enrichedSource(spark: SparkSession, cfg: Config, dict: DataFrame,
                     key: String): DataFrame =
    TraceIngest.normalize(source(spark, cfg))
      .join(broadcast(dict), Seq(key), "left")

  /** Streaming hourly rollup with watermark (B7 streaming form): the
    * materialized-view TODO of the reference
    * (/root/reference/README.md:231-236) as a live windowed aggregate. */
  def hourlyRollup(spark: SparkSession, cfg: Config): DataFrame =
    TraceIngest.normalize(source(spark, cfg))
      .withWatermark("Time", "1 hour")
      .groupBy(window(col("Time"), "1 hour"), col("Type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("Type"), col("n"))

  // ------------------------------------------------------------------ persistent incremental rollup (B6, SummingMergeTree form)
  /** The maintained rollup's aggregate shape: (ym, Type) → row count +
    * severity sum — decomposable measures only, so increments merge by
    * summation ([[TraceStore.mergeRollups]]). Severity widens to long
    * before summing: the stored sum keeps growing across merges. */
  private def rollOf(df: DataFrame): DataFrame =
    df.groupBy(date_format(col("Time"), "yyyyMM").as("ym"), col("Type"))
      .agg(count(lit(1)).as("n"), sum(col("Severity").cast("long")).as("sev_sum"))

  /** Complete versions under a rollup root, ascending by batch id. A
    * version is a `v<batchId>` subdirectory whose parquet commit finished
    * (_SUCCESS present) — half-written versions are invisible. */
  private def rollupVersions(root: java.nio.file.Path): Seq[(Long, java.nio.file.Path)] =
    graft.store.FsMaint.listDir(root)
      .filter(p => java.nio.file.Files.exists(p.resolve("_SUCCESS")))
      .flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v")) n.drop(1).toLongOption.map(_ -> p) else None
      }
      .sortBy(_._1)

  /** Read the current (highest complete version) maintained rollup. The
    * returned DataFrame is lazy; the maintainer's prune keeps a one-extra-
    * version grace tail, so execute it within roughly one maintenance
    * cycle (or cache it) — a version three commits stale may be deleted
    * under a longer-lived handle. */
  def readRollup(spark: SparkSession, rollupPath: String): DataFrame = {
    val vs = rollupVersions(java.nio.file.Paths.get(rollupPath))
    require(vs.nonEmpty, s"no complete rollup version under $rollupPath")
    spark.read.parquet(vs.last._2.toString)
  }

  /** One maintenance step: fold a normalized micro-batch into the stored
    * rollup. Crash-safe and replay-idempotent without coordination:
    *  - each batch writes a NEW version dir `v<batchId>` (never mutates
    *    the current one), merging from the highest complete version with
    *    a SMALLER id — so a replayed batch (foreachBatch is
    *    at-least-once) rebuilds its own version from the same inputs
    *    instead of double-counting itself;
    *  - a crash mid-write leaves a version without _SUCCESS, which no
    *    reader or later merge ever sees;
    *  - older versions are pruned only after the new write committed
    *    (the previous version is kept as the replay merge source).
    * Cost per batch ∝ rollup cardinality + batch size — never the
    * accumulated raw history. */
  def upsertRollup(batch: DataFrame, batchId: Long, rollupPath: String,
                   incarnation: String = "default"): Unit = {
    val spark = batch.sparkSession
    val root = java.nio.file.Paths.get(rollupPath)
    // Batch ids are only meaningful within ONE checkpoint lineage: a
    // fresh/wiped checkpoint restarts ids at 0, and treating the old
    // v0's _SUCCESS as "already done" would silently DROP every new
    // batch until the id passes the old maximum. Pin the lineage and
    // fail loudly on a mismatch — the operator must clear rollupPath
    // (or keep the checkpoint) rather than lose data silently.
    val incFile = root.resolve("_incarnation")
    if (java.nio.file.Files.exists(incFile)) {
      val prev = new String(java.nio.file.Files.readAllBytes(incFile),
        java.nio.charset.StandardCharsets.UTF_8).trim
      require(prev == incarnation,
        s"rollup at $rollupPath belongs to checkpoint lineage '$prev' but this " +
        s"query runs under '$incarnation' — batch ids are incomparable across " +
        "lineages; clear the rollup path or restore the original checkpoint")
    } else {
      java.nio.file.Files.createDirectories(root)
      java.nio.file.Files.write(incFile,
        incarnation.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val own = root.resolve(s"v$batchId")
    // Replay of an already-committed version: the rewrite would produce
    // identical rows by construction (same base, same batch), so skip it
    // rather than overwrite-in-place — an in-place rewrite would delete a
    // version a concurrent reader may have just resolved as current.
    if (java.nio.file.Files.exists(own.resolve("_SUCCESS"))) return
    val base = rollupVersions(root).filter(_._1 < batchId).lastOption
    val delta = rollOf(batch)
    val merged = base match {
      case Some((_, p)) => TraceStore.mergeRollups(
        spark.read.parquet(p.toString), delta, Seq("ym", "Type"), Seq("n", "sev_sum"))
      case None => delta
    }
    merged.coalesce(1).write.mode("overwrite").parquet(own.toString)
    // prune: keep the current version, the replay merge source for the
    // NEXT batch, and one more as a grace window for readers holding a
    // lazy DataFrame over a recently-current version (readRollup).
    // _SUCCESS goes FIRST so a crash mid-delete leaves the dir invisible
    // to rollupVersions, never a "complete" version missing part-files.
    rollupVersions(root).dropRight(3).foreach { case (_, p) =>
      java.nio.file.Files.deleteIfExists(p.resolve("_SUCCESS"))
      graft.store.FsMaint.deleteTree(p)
    }
  }

  /** Streaming materialized-view maintenance (B6 incremental form —
    * the SummingMergeTree analogue running live): keep the persistent
    * (ym, Type) rollup current per micro-batch. One maintainer per
    * rollupPath; the checkpoint serializes batch ids. The checkpoint is
    * derived from cfg's with a `-rollup` suffix so one Config can drive
    * both `start` (ingest) and this maintainer — sharing the literal
    * checkpoint dir would make the second query fail or silently resume
    * from the first one's committed offsets.
    *
    * WARNING: when one Config drives both queries, `deleteOnSuccess`
    * must stay false — with `cleanSource=delete` each query deletes
    * files it commits, and the OTHER query (separate checkpoint, own
    * pace) never sees whatever the faster one deleted first: rows
    * silently missing from the store or the rollup. Delete-on-success
    * is a single-consumer contract. */
  def maintainRollup(spark: SparkSession, cfg: Config, rollupPath: String): StreamingQuery = {
    require(!cfg.deleteOnSuccess,
      "deleteOnSuccess with a rollup maintainer loses files: two queries " +
      "watch the dir and whichever commits first deletes what the other has " +
      "not yet read — run the maintainer off the ingested store instead")
    val inc = incarnationOf(cfg.checkpointDir.stripSuffix("/") + "-rollup")
    TraceIngest.normalize(source(spark, cfg))
      .writeStream
      .queryName("trace-rollup-maintain")
      .option("checkpointLocation", cfg.checkpointDir.stripSuffix("/") + "-rollup")
      .trigger(cfg.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertRollup(batch, batchId, rollupPath, inc)
      }
      .start()
  }
}

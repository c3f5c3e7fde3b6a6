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
    splitsPerMonth: Int = 8,
    /** Background-merge cadence — the ClickHouse analogue for a
      * long-running ingest (the reference counts on MergeTree merging
      * its one-INSERT-per-file parts; a streaming parquet store must
      * compact its own micro-batch files or range scans degrade).
      * Some(n): after every n-th committed batch, compact months that
      * exceed `compactOver` files. The stream is the store's single
      * maintenance writer, so the protocol's single-writer rule holds by
      * construction; compaction runs AFTER the batch's append + marker,
      * off the commit's correctness path, and a replayed batch re-runs
      * it harmlessly (compact is idempotent and skips small months). */
    compactEveryBatches: Option[Int] = None,
    /** File-count threshold for the cadenced compaction. */
    compactOver: Int = 16,
    /** Data-time retention on the same cadence — the ClickHouse
      * `TTL Time + INTERVAL n MONTH DELETE` analogue: on each cadence
      * hit, keep only the newest n month partitions (anchored to the
      * newest ym in the store, so a historical backfill is not
      * truncated by wall-clock). Runs BEFORE compaction so a condemned
      * month is never pointlessly rewritten first. Requires
      * `compactEveryBatches` to supply the cadence. */
    retainMonths: Option[Int] = None)

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
    * suppress (ingest) or silently skip (rollup) the new one's batches.
    *
    * The lineage is the streaming query id Spark writes into the
    * checkpoint's `metadata` file at checkpoint CREATION — a checkpoint
    * wiped in place gets a fresh UUID, so stale markers/versions keyed by
    * the old lineage can never suppress the new one's batches (a pure
    * path hash was blind to wipe-in-place: same path, restarted ids).
    * Read via the Hadoop FileSystem API so a non-local checkpoint
    * (HDFS/S3A) resolves the same way Spark itself resolves it. Falls
    * back to a path hash only when the metadata file is unreadable; the
    * marker/version id guards in [[start]]/[[upsertRollup]] then catch a
    * wiped lineage loudly instead of silently. */
  private[streaming] def lineageOf(spark: SparkSession, checkpointDir: String): String = {
    val meta = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fromMeta =
      try {
        if (!fs.exists(meta)) None
        else {
          val in = fs.open(meta)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          """"id"\s*:\s*"([0-9a-fA-F-]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
        }
      } catch { case _: java.io.IOException => None }
    fromMeta.getOrElse(incarnationOf(checkpointDir))
  }

  /** Path-hash fallback lineage (pre-metadata checkpoints, unreadable
    * metadata). Blind to wipe-in-place — which is why every consumer
    * also id-guards against markers/versions from the future. */
  private[streaming] def incarnationOf(checkpointDir: String): String = {
    val abs = java.nio.file.Paths.get(checkpointDir).toAbsolutePath.toString
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Ingest-batch marker ids present under `<tablePath>/_ingest_batches/<inc>`. */
  private def markerIds(fs: org.apache.hadoop.fs.FileSystem,
                        dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("v")) n.drop(1).toLongOption else None
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
    // Lineage resolves LAZILY, on the first batch: the checkpoint's
    // metadata file only exists once the query has started, and
    // foreachBatch runs driver-side strictly after that.
    var inc: String = null
    TraceIngest.normalize(source(spark, cfg))
      .writeStream
      .queryName("trace-ingest")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (inc == null) inc = lineageOf(s, cfg.checkpointDir)
        val dir = new org.apache.hadoop.fs.Path(cfg.tablePath, s"_ingest_batches/$inc")
        val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(dir, s"v$batchId")
        // Within one lineage batch ids are monotone and only the latest
        // uncommitted batch can replay — a marker AHEAD of the current
        // batch can only come from a wiped-in-place checkpoint under the
        // path-hash fallback. The check runs BEFORE the replay-skip: a
        // surviving v0 marker from a dead lineage must not silently
        // swallow the new lineage's batch 0 just because the ids collide
        // while later stale markers sit in plain sight. (The one
        // irreducible fallback hole — old lineage died at EXACTLY the
        // same batch id, leaving no later marker — is indistinguishable
        // from a genuine replay by ids alone; the metadata-derived
        // lineage closes it, which is why the fallback is last-resort.)
        val ids = markerIds(fs, dir)
        require(ids.forall(_ <= batchId),
          s"ingest markers up to v${ids.max} exist under $dir but this query is " +
          s"at batch $batchId — the checkpoint was wiped in place and batch ids " +
          "restarted; clear the marker directory (the table keeps its data) or " +
          "restore the original checkpoint")
        if (!ids.contains(batchId)) {
          TraceStore.append(batch, cfg.tablePath, cfg.splitsPerMonth)
          fs.mkdirs(dir)
          fs.create(marker, true).close()
          // Retention: once this batch's offsets commit, only THIS batch can
          // ever replay — markers two or more behind are dead bookkeeping.
          // Keep batchId-1 as grace for the commit-in-flight window.
          ids.filter(_ < batchId - 1)
            .foreach(i => fs.delete(new org.apache.hadoop.fs.Path(dir, s"v$i"), true))
          // cadenced background merge (see Config.compactEveryBatches):
          // runs after the commit + marker, so a crash mid-compaction
          // never loses the batch — the manifest protocol repairs the
          // half-done month on the next cadence hit or manual compact
          cfg.compactEveryBatches.foreach { n =>
            if (batchId % n == n - 1) {
              cfg.retainMonths.foreach(m =>
                TraceStore.retainLastMonths(cfg.tablePath, m))
              TraceStore.compact(s, cfg.tablePath, cfg.compactOver, cfg.splitsPerMonth)
            }
          }
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
    * (_SUCCESS present) — half-written versions are invisible. All file
    * ops go through the Hadoop FileSystem API: the rollup root may live
    * on whatever filesystem the store itself writes to (HDFS/S3A), not
    * just the driver's local disk. */
  private def rollupVersions(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v")) n.drop(1).toLongOption.map(_ -> st.getPath) else None
      }
      .sortBy(_._1)

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Read the current (highest complete version) maintained rollup. The
    * returned DataFrame is lazy; the maintainer's prune keeps a one-extra-
    * version grace tail, so execute it within roughly one maintenance
    * cycle (or cache it) — a version three commits stale may be deleted
    * under a longer-lived handle. */
  def readRollup(spark: SparkSession, rollupPath: String): DataFrame = {
    val (fs, root) = fsOf(spark, rollupPath)
    val vs = rollupVersions(fs, root)
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
                   incarnation: String = "default"): Unit =
    upsertDelta(batch.sparkSession, rollOf(batch), batchId, rollupPath, incarnation)

  /** The shared versioned-merge step behind [[upsertRollup]] (unsigned
    * micro-batch deltas), [[followRollup]] and [[followIndex]] (signed
    * change-feed deltas). `delta` must already be aggregated to
    * `keys ++ measures`; groups whose FIRST measure reaches zero after
    * the merge (a signed feed deleted every row) leave the table. */
  private[graft] def upsertDelta(spark: SparkSession, delta: DataFrame, batchId: Long,
                                 rollupPath: String, incarnation: String,
                                 keys: Seq[String] = Seq("ym", "Type"),
                                 measures: Seq[String] = Seq("n", "sev_sum"),
                                 versionFileBytes: Long = DefaultBaseFileBytes): Unit = {
    val (fs, root) = fsOf(spark, rollupPath)
    // Batch ids are only meaningful within ONE checkpoint lineage: a
    // fresh/wiped checkpoint restarts ids at 0, and treating the old
    // v0's _SUCCESS as "already done" would silently DROP every new
    // batch until the id passes the old maximum. Pin the lineage and
    // fail loudly on a mismatch — the operator must clear rollupPath
    // (or keep the checkpoint) rather than lose data silently.
    val incFile = new org.apache.hadoop.fs.Path(root, "_incarnation")
    if (fs.exists(incFile)) {
      val in = fs.open(incFile)
      val prev = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
      require(prev == incarnation,
        s"rollup at $rollupPath belongs to checkpoint lineage '$prev' but this " +
        s"query runs under '$incarnation' — batch ids are incomparable across " +
        "lineages; clear the rollup path or restore the original checkpoint")
    } else {
      fs.mkdirs(root)
      val out = fs.create(incFile, true)
      try out.write(incarnation.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val existing = rollupVersions(fs, root)
    // Second wipe-in-place defense, for when the lineage string itself is
    // a path-hash fallback (same path, wiped checkpoint → SAME lineage but
    // restarted ids): within one real lineage only the latest uncommitted
    // batch replays, so no complete version can ever be AHEAD of the
    // current batch. A future version means incomparable ids — fail loudly
    // instead of merging new deltas under a stale current version.
    require(existing.forall(_._1 <= batchId),
      s"rollup at $rollupPath has complete version v${existing.lastOption.map(_._1).getOrElse(-1L)} " +
      s"ahead of batch $batchId — the checkpoint was wiped in place and batch ids " +
      "restarted; clear the rollup path or restore the original checkpoint")
    val own = new org.apache.hadoop.fs.Path(root, s"v$batchId")
    // Replay of an already-committed version: the rewrite would produce
    // identical rows by construction (same base, same batch), so skip it
    // rather than overwrite-in-place — an in-place rewrite would delete a
    // version a concurrent reader may have just resolved as current.
    if (existing.exists(_._1 == batchId)) return
    val base = existing.filter(_._1 < batchId).lastOption
    val merged = base match {
      case Some((_, p)) => TraceStore.mergeRollups(
        spark.read.parquet(p.toString), delta, keys, measures)
      case None => delta
    }
    // the version write's parallelism is sized by the PRIOR version's
    // bytes (an upper-bound proxy for the merged output): a (ym, Type)
    // rollup stays one file forever, but a wider bounded key space must
    // not funnel its whole version through one task per batch. (A
    // time-span-PROPORTIONAL key space — the sub-second slot table —
    // does not belong in this family at all: [[followSlotRollup]] routes
    // through [[upsertSegment]] so trickle batches stay O(delta).)
    // readRollup reads versions as directories, so multi-file versions
    // are plumbing, exactly like the index family's multi-file bases.
    val baseBytes = base.map(b => fs.getContentSummary(b._2).getLength).getOrElse(0L)
    val targetParts = math.max(1L,
      math.ceil(baseBytes.toDouble / versionFileBytes).toLong).min(Int.MaxValue).toInt
    val shuffleWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val out = merged.filter(col(measures.head) =!= 0L)
    val sized =
      if (targetParts <= shuffleWidth) out.coalesce(targetParts)
      else out.repartition(targetParts, keys.map(col): _*)
    sized.write.mode("overwrite").parquet(own.toString)
    // prune: keep the current version, the replay merge source for the
    // NEXT batch, and one more as a grace window for readers holding a
    // lazy DataFrame over a recently-current version (readRollup).
    // _SUCCESS goes FIRST so a crash mid-delete leaves the dir invisible
    // to rollupVersions, never a "complete" version missing part-files.
    rollupVersions(fs, root).dropRight(3).foreach { case (_, p) =>
      fs.delete(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), false)
      fs.delete(p, true)
    }
    // sweep crash orphans (the index family's compaction-time discipline,
    // here on every committed version): an incomplete (_SUCCESS-less)
    // version dir BELOW this batch is a dead mid-write remnant — the only
    // replayable batch is this one, which just committed, so nothing
    // running can still claim an older incomplete dir
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.drop(1).toLongOption.exists(_ < batchId)) {
          fs.delete(st.getPath, true)
          ()
        }
      }
  }

  /** ROLLING month-scope migration for a maintained rollup — the
    * production "last N months" that ADVANCES. The months spec is part
    * of the offset contract and therefore pinned per checkpoint
    * ([[graft.sources.CdcSource]]), so a scope change is a documented
    * MIGRATION, not a mutable option:
    *
    *  1. quiesce the old maintainer (drain it to current, stop it);
    *  2. call this — it pins the store's state and writes the NEW
    *     scope's seed under `newRollupPath` as pre-batch-0 version
    *     `v-1`: because `ym` is part of the rollup key, the new scope's
    *     content is PURE SUBTRACTION of the aged-out months from the
    *     old rollup — a filter of the maintained table; the store is
    *     never recomputed;
    *  3. start a NEW checkpoint: `followRollup(…, months =
    *     Some(newMonths), startingSnapshot = Some(returnedPin))` — the
    *     seed serves as the merge base for the first batch and the
    *     stream follows month-pruned changes after the pin;
    *  4. verify ([[readRollup]] equals the scoped recompute), then
    *     retire the old rollup + checkpoint and drop the pin once the
    *     new stream's offset passes its first complete form.
    *
    * Cost: O(old rollup) — bounded group space, no store scan. Refuses
    * a non-empty target (migrating onto live versions would make batch
    * ids incomparable). The seed only equals the scoped truth if the
    * old maintainer was CURRENT at the pin — hence quiesce-first. */
  def migrateRollupMonths(spark: SparkSession, storePath: String,
                          oldRollupPath: String, newRollupPath: String,
                          newMonths: String): String = {
    val (fs, root) = fsOf(spark, newRollupPath)
    // a lone completed seed may be overwritten (a re-run before the new
    // follow ever started); once the follow has committed versions,
    // re-seeding would make batch ids incomparable — refuse
    require(rollupVersions(fs, root).forall(_._1 == -1L),
      s"rollup at $newRollupPath already has maintained versions — migrate " +
        "into an empty path (or one holding only an unconsumed seed)")
    // pin FIRST: the new follow's first diff runs against this immutable
    // base, so every change after it (and none before) reaches the seed
    val pin = TraceStore.snapshot(storePath)
    val scoped = readRollup(spark, oldRollupPath)
      .filter(graft.sources.CdcStreamProvider.monthsColumn(newMonths, col("ym")))
    scoped.coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(root, "v-1").toString)
    pin
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
    val ckpt = cfg.checkpointDir.stripSuffix("/") + "-rollup"
    var inc: String = null   // resolved on first batch — metadata exists by then
    TraceIngest.normalize(source(spark, cfg))
      .writeStream
      .queryName("trace-rollup-maintain")
      .option("checkpointLocation", ckpt)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) inc = lineageOf(batch.sparkSession, ckpt)
        upsertRollup(batch, batchId, rollupPath, inc)
      }
      .start()
  }

  /** CDC-DRIVEN rollup maintenance as a running stream — q227's signed
    * algebra made operational: follow a trace STORE's change feed
    * (`format("graft-cdc")`, offsets = pinned snapshots) and fold each
    * micro-batch's signed increments into the versioned rollup. Unlike
    * [[maintainRollup]] (which folds the ingest's append-only
    * micro-batches), this maintainer stays correct across the store's
    * OWN maintenance: DELETE WHERE / retention arrive as negative
    * increments, compaction arrives as an empty batch, and a group whose
    * count reaches zero leaves the rollup. The first batch is the full
    * table as inserts (`initialLoad`), so the rollup bootstraps itself.
    *
    * Same crash/replay story as [[upsertRollup]]: the CDC source replays
    * a batch as the IDENTICAL snapshot diff (pins are immutable), and
    * the version-dir guard rebuilds rather than double-counts it. Cost
    * per batch ∝ changed files + rollup cardinality — never the
    * accumulated table, which is what makes maintaining a 100 TB store's
    * rollup a trickle job rather than a recurring full scan. */
  def followRollup(spark: SparkSession, storePath: String, rollupPath: String,
                   checkpointDir: String,
                   trigger: Trigger = Trigger.AvailableNow(),
                   maxFilesPerTrigger: Option[Int] = None,
                   maxBytesPerTrigger: Option[Long] = None,
                   months: Option[String] = None,
                   startingSnapshot: Option[String] = None): StreamingQuery =
    followRollupFrom(spark,
      _.option("path", storePath), rollupPath, checkpointDir, trigger,
      maxFilesPerTrigger, maxBytesPerTrigger, months, startingSnapshot)

  /** FLEET-wide rollup maintenance: [[followRollup]] over N stores
    * through ONE checkpoint (the multi-store `paths` source,
    * [[graft.sources.CdcMultiSource]]) — the reference's
    * one-table-per-cluster shape rolled up ACROSS the fleet. Each
    * micro-batch carries one store's signed changes; the (ym, Type)
    * delta ignores the `_store` tag, so the maintained rollup is the
    * union rollup, and one store's DELETE WHERE arrives as negative
    * increments without touching the others' contributions (signed
    * summation is associative across stores — the same algebra that
    * makes chunk slices composable makes store interleavings
    * composable). Per-store pins, admission control, and crash/replay
    * semantics all delegate to the fleet source. */
  def followRollup(spark: SparkSession, storePaths: Seq[String], rollupPath: String,
                   checkpointDir: String,
                   trigger: Trigger,
                   maxFilesPerTrigger: Option[Int],
                   maxBytesPerTrigger: Option[Long],
                   months: Option[String]): StreamingQuery =
    followRollupFrom(spark,
      _.option("paths", storePaths.mkString(",")), rollupPath, checkpointDir,
      trigger, maxFilesPerTrigger, maxBytesPerTrigger, months)

  /** [[followRollup]] fleet overload with the usual defaults (Scala
    * cannot default-arg two overloads of one name). */
  def followFleetRollup(spark: SparkSession, storePaths: Seq[String],
                        rollupPath: String, checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow(),
                        maxFilesPerTrigger: Option[Int] = None,
                        maxBytesPerTrigger: Option[Long] = None,
                        months: Option[String] = None): StreamingQuery =
    followRollup(spark, storePaths, rollupPath, checkpointDir, trigger,
      maxFilesPerTrigger, maxBytesPerTrigger, months)

  private def followRollupFrom(spark: SparkSession,
                               source: org.apache.spark.sql.streaming.DataStreamReader =>
                                 org.apache.spark.sql.streaming.DataStreamReader,
                               rollupPath: String, checkpointDir: String,
                               trigger: Trigger,
                               maxFilesPerTrigger: Option[Int],
                               maxBytesPerTrigger: Option[Long],
                               months: Option[String] = None,
                               startingSnapshot: Option[String] = None): StreamingQuery = {
    var inc: String = null   // resolved on first batch — metadata exists by then
    // a starting pin means the rollup was SEEDED (a migrated scope's
    // filtered copy, [[migrateRollupMonths]]) — follow changes after the
    // pin instead of bootstrapping the table the seed already contains
    val reader = source(spark.readStream.format("graft-cdc"))
      .option("initialLoad", startingSnapshot.isEmpty.toString)
    startingSnapshot.foreach(p => reader.option("startingSnapshot", p))
    months.foreach(m => reader.option("months", m))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-rollup-${incarnationOf(rollupPath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) inc = lineageOf(batch.sparkSession, checkpointDir)
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = batch
          .groupBy(col("ym"), col("Type"))
          .agg(sum(sign).as("n"), sum(sign * col("Severity").cast("long")).as("sev_sum"))
        upsertDelta(batch.sparkSession, delta, batchId, rollupPath, inc)
      }
      .start()
  }

  /** SUB-SECOND (micros-mode) rollup maintenance from the change feed —
    * the reference's considered-and-dropped sub-second TODO
    * (/root/reference/README.md:219-225) closed END TO END: q236 gates
    * micros ingest + `DateTime64(6)` DDL; this maintains a sub-second
    * tumbling-window aggregate of a micros-time store THROUGH the signed
    * feed, so the sub-second resolution survives store maintenance the
    * same way the (ym, Type) rollup does. The window key is the slot
    * index `unix_micros(Time) div slotMicros` — integer division on
    * microsecond epochs, exact in any engine (a timestamp-typed window
    * start would re-open the cross-engine micros-rendering can of
    * worms for zero semantic gain; slot × slotMicros IS the window
    * start in micros).
    *
    * Lineage pinning, replay idempotence, signed retraction, and
    * emptied-group drop are [[followRollup]]'s semantics with a
    * different key — but the STORAGE is the index family's SEGMENT
    * store ([[upsertSegment]]), not the rollup family's merged
    * versions, because the key space is time-span-proportional:
    * distinct active slots ∝ data time span / slot width (a multi-year
    * micros store at 250 ms slots is ~10⁹ groups), and a merged-version
    * rewrite per trickle batch would cost O(that cardinality) every
    * batch. Through the segment store each batch appends its signed
    * slot delta as an O(delta) segment and every `compactOver`-th state
    * change folds base+segments into a size-targeted multi-file base —
    * amortized O(delta + slots/compactOver), the exact cost argument
    * [[followIndex]]'s scaladoc makes for the corpus-proportional
    * bucket census. Read it back with [[readSlotRollup]] (merge-on-
    * read, bounded segment count). */
  def followSlotRollup(spark: SparkSession, storePath: String, rollupPath: String,
                       checkpointDir: String,
                       slotMicros: Long = 250000L,
                       trigger: Trigger = Trigger.AvailableNow(),
                       maxFilesPerTrigger: Option[Int] = None,
                       maxBytesPerTrigger: Option[Long] = None,
                       months: Option[String] = None,
                       compactOver: Int = 8,
                       baseFileBytes: Long = DefaultBaseFileBytes): StreamingQuery = {
    require(slotMicros > 0, s"slotMicros must be positive, got $slotMicros")
    var inc: String = null   // resolved on first batch — metadata exists by then
    val reader = spark.readStream.format("graft-cdc")
      .option("path", storePath)
      .option("initialLoad", "true")
    months.foreach(m => reader.option("months", m))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-slot-rollup-${incarnationOf(rollupPath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) inc = lineageOf(batch.sparkSession, checkpointDir)
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = batch
          .groupBy(expr(s"unix_micros(Time) div $slotMicros").as("slot"), col("Type"))
          .agg(sum(sign).as("n"), sum(sign * col("Severity").cast("long")).as("sev_sum"))
        upsertSegment(batch.sparkSession, delta, batchId, rollupPath, inc,
          keys = Seq("slot", "Type"), measures = Seq("n", "sev_sum"),
          compactOver = compactOver, baseFileBytes = baseFileBytes)
      }
      .start()
  }

  /** Read the current [[followSlotRollup]] table (merge-on-read over
    * the slot store's segments — see [[readIndex]], which this wraps
    * with the slot family's declared shape). */
  def readSlotRollup(spark: SparkSession, rollupPath: String): DataFrame =
    readIndex(spark, rollupPath,
      keys = Seq("slot", "Type"), measures = Seq("n", "sev_sum"))

  /** FLEET-wide sub-second rollup: [[followSlotRollup]] over N stores
    * through ONE checkpoint — the slot twin of [[followFleetRollup]].
    * The (slot, Type) delta ignores the `_store` tag, so the maintained
    * table is the UNION slot aggregate (signed summation is associative
    * across stores exactly as across chunk slices), each micro-batch
    * carries one store's changes under the shared admission budget, and
    * the segment store keeps every trickle batch O(delta) no matter how
    * many stores feed it. Membership growth (appended stores) applies
    * unchanged — newcomers bootstrap their slots through the feed. */
  def followFleetSlotRollup(spark: SparkSession, storePaths: Seq[String],
                            rollupPath: String, checkpointDir: String,
                            slotMicros: Long = 250000L,
                            trigger: Trigger = Trigger.AvailableNow(),
                            maxFilesPerTrigger: Option[Int] = None,
                            maxBytesPerTrigger: Option[Long] = None,
                            months: Option[String] = None,
                            compactOver: Int = 8,
                            baseFileBytes: Long = DefaultBaseFileBytes): StreamingQuery = {
    require(slotMicros > 0, s"slotMicros must be positive, got $slotMicros")
    var inc: String = null   // resolved on first batch — metadata exists by then
    val reader = spark.readStream.format("graft-cdc")
      .option("paths", storePaths.mkString(","))
      .option("initialLoad", "true")
    months.foreach(m => reader.option("months", m))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-fleet-slot-rollup-${incarnationOf(rollupPath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) inc = lineageOf(batch.sparkSession, checkpointDir)
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = batch
          .groupBy(expr(s"unix_micros(Time) div $slotMicros").as("slot"), col("Type"))
          .agg(sum(sign).as("n"), sum(sign * col("Severity").cast("long")).as("sev_sum"))
        upsertSegment(batch.sparkSession, delta, batchId, rollupPath, inc,
          keys = Seq("slot", "Type"), measures = Seq("n", "sev_sum"),
          compactOver = compactOver, baseFileBytes = baseFileBytes)
      }
      .start()
  }

  /** CDC-DRIVEN near-dup-index maintenance as a running stream — q231's
    * signed bucket algebra made operational, the index-family twin of
    * [[followRollup]]: follow a trace store's change feed and keep the
    * dedup family's band-bucket LSH index (the table q26-style candidate
    * joins run on) current per micro-batch. Each batch's rows pass the
    * map-only MinHash signature kernel
    * ([[graft.store.ChangeFeedQuery.bucketRows]]) with a ±1 sign; the
    * signed per-(band, bkey) counts land in a SEGMENTED, crash-safe
    * parquet index under `indexPath`: inserts add their bucket rows,
    * DELETE WHERE / retention retract them, a compaction's cancelling
    * pairs net out (possibly across chunked batches — transient
    * insert+delete of the same row sums to zero by construction), and an
    * emptied bucket leaves the index at read/compaction time. The first
    * batch is the full table as inserts (`initialLoad`), so the index
    * bootstraps itself.
    *
    * WHY segments, not the rollup family's merged versions: a rollup's
    * cardinality is bounded by its group space, so rewriting it per
    * batch is cheap forever — but this index's cardinality grows with
    * the CORPUS, and a merge-per-batch would make every trickle batch
    * cost O(index) (a full rewrite of a 100 TB corpus's bucket table,
    * per batch). Instead each batch appends its delta as an immutable
    * SEGMENT (`seg-<batchId>`, cost O(changed rows)) and every
    * `compactOver`-th state change folds base+segments into a new
    * `base-<batchId>` — the SummingMergeTree parts-and-background-merge
    * model, amortized O(delta + index/compactOver) per batch. Readers
    * merge on read ([[readIndex]]): newest base ⊎ later segments,
    * signed-summed — segment count is bounded by `compactOver`, so the
    * read never degrades unboundedly.
    *
    * Same crash/replay story as [[followRollup]]: segments and bases are
    * `_SUCCESS`-gated dirs named by batch id, so an at-least-once replay
    * rebuilds ITS OWN segment/base from the same inputs instead of
    * double-counting (a compaction replay re-reads the prior base +
    * segments, which pruning keeps until the next batch commits), a
    * crash mid-write leaves an invisible dir, and batch ids are
    * lineage-pinned against wiped checkpoints. */
  def followIndex(spark: SparkSession, storePath: String, indexPath: String,
                  checkpointDir: String,
                  trigger: Trigger = Trigger.AvailableNow(),
                  maxFilesPerTrigger: Option[Int] = None,
                  maxBytesPerTrigger: Option[Long] = None,
                  compactOver: Int = 8,
                  startingSnapshot: Option[String] = None,
                  baseFileBytes: Long = DefaultBaseFileBytes,
                  months: Option[String] = None,
                  bands: Int = 2): StreamingQuery = {
    // Corpus-scale bootstrap: streaming the initial load through the
    // chunked path re-folds the GROWING index every compactOver-th batch
    // (Σ over compactions of the index-so-far — super-linear in the
    // corpus). The production shape is [[seedIndex]]: build the base in
    // ONE batch job over a pinned snapshot, then follow from that pin —
    // `startingSnapshot` switches the source to changes-after-pin and
    // the seed serves as the pre-batch-0 base.
    var inc: String = null   // resolved on first batch — metadata exists by then
    val reader = spark.readStream.format("graft-cdc")
      .option("path", storePath)
      .option("initialLoad", startingSnapshot.isEmpty.toString)
    startingSnapshot.foreach(p => reader.option("startingSnapshot", p))
    months.foreach(m => reader.option("months", m))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-index-${incarnationOf(indexPath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) {
          inc = lineageOf(batch.sparkSession, checkpointDir)
          pinBands(batch.sparkSession, indexPath, bands)
        }
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = graft.store.ChangeFeedQuery
          .bucketRows(batch.withColumn("_s", sign), carry = Seq("_s"), bands = bands)
          .groupBy(col("band"), col("bkey"))
          .agg(sum(col("_s")).as("n"))
        upsertSegment(batch.sparkSession, delta, batchId, indexPath, inc,
          keys = Seq("band", "bkey"), measures = Seq("n"), compactOver = compactOver,
          baseFileBytes = baseFileBytes)
      }
      .start()
  }

  /** CDC-driven maintenance of the index's MEMBERSHIP table — the
    * band-bucket rows THEMSELVES (`(band, bkey, doc)`, doc = the
    * `Machine/Type/ID` key the signatures are computed over), kept
    * current per micro-batch through the same signed segment algebra as
    * [[followIndex]]'s count census. The census answers the planner
    * (how hot is each bucket — q241); the membership closes the loop it
    * opens: q26-style candidate PAIRS generate directly from the
    * maintained table ([[indexCandidatePairs]]) — a bucket-confined
    * self-join plus an exact verify over the pair's own key strings —
    * so the corpus is never re-shingled: maintenance costs O(changes)
    * per batch and pair generation costs O(index + candidates).
    *
    * Same segment-store scale story as [[followIndex]] (the membership
    * is corpus-proportional — strictly bigger than the census — so
    * merged versions are out): O(delta) appends, cadenced size-targeted
    * base folds, merge-on-read, lineage pinning, replay idempotence.
    * An insert adds its `(band, bkey, doc)` rows with +1, a DELETE
    * WHERE retracts them with −1, and a doc whose count empties leaves
    * the membership — per-key signed summation IS membership GC. */
  def followMemberIndex(spark: SparkSession, storePath: String, indexPath: String,
                        checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow(),
                        maxFilesPerTrigger: Option[Int] = None,
                        maxBytesPerTrigger: Option[Long] = None,
                        compactOver: Int = 8,
                        startingSnapshot: Option[String] = None,
                        baseFileBytes: Long = DefaultBaseFileBytes,
                        months: Option[String] = None): StreamingQuery = {
    var inc: String = null   // resolved on first batch — metadata exists by then
    val reader = spark.readStream.format("graft-cdc")
      .option("path", storePath)
      .option("initialLoad", startingSnapshot.isEmpty.toString)
    startingSnapshot.foreach(p => reader.option("startingSnapshot", p))
    months.foreach(m => reader.option("months", m))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-members-${incarnationOf(indexPath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) inc = lineageOf(batch.sparkSession, checkpointDir)
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val keyed = batch
          .withColumn("_s", sign)
          .withColumn("doc",
            concat(col("Machine"), lit("/"), col("Type"), lit("/"), col("ID")))
        val delta = graft.store.ChangeFeedQuery
          .bucketRows(keyed, carry = Seq("_s", "doc"))
          .groupBy(col("band"), col("bkey"), col("doc"))
          .agg(sum(col("_s")).as("n"))
        upsertSegment(batch.sparkSession, delta, batchId, indexPath, inc,
          keys = Seq("band", "bkey", "doc"), measures = Seq("n"),
          compactOver = compactOver, baseFileBytes = baseFileBytes)
      }
      .start()
  }

  /** q26-style candidate pairs generated FROM the maintained membership
    * index ([[followMemberIndex]]) — the operational payoff of keeping
    * the index streamed: the corpus-wide signature pass a from-scratch
    * candidate generation would run (re-shingling 100 TB) never runs.
    * Hot buckets (≥ 2 members — exactly the set the q241 planner
    * counts) gate a bucket-confined self-join; the same doc pair found
    * by several bands dedups to one row. Cost O(index) for the hot
    * filter + O(Σ admitted-bucket n²) for the join — the planner's
    * `cand_pairs` budget, known BEFORE running this. Verification
    * (exact similarity over the pair's own key strings) is the
    * caller's next map-only step, O(candidates).
    *
    * `maxBucket` is the ADMISSION bound: a bucket whose membership
    * exceeds it is degenerate — its signature stopped discriminating
    * (the classic LSH mega-bucket), its n·(n−1)/2 pairs dominate the
    * whole join's cost while verifying almost entirely to non-dups, and
    * it is exactly what the q241 calibration read flags as "re-band
    * before you join". Skipping it bounds the candidate volume by
    * buckets × maxBucket²/2 — scale-stable where an uncapped join grows
    * quadratically with the hottest key. */
  def indexCandidatePairs(spark: SparkSession, indexPath: String,
                          maxBucket: Int = 32): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be at least 2, got $maxBucket")
    // the merged membership feeds TWO consumers (the hot-bucket census
    // and the pair join's probe side), and a broadcast boundary sits
    // between them — without a materialization the merge-on-read
    // aggregation runs twice (measured: the two identical signed-sum
    // subtrees never reuse their exchange across the broadcast build).
    // Lazy localCheckpoint: index-sized (bounded by the maintainer's
    // fold cadence), materialized once inside the first consuming job.
    val m = readIndex(spark, indexPath,
      keys = Seq("band", "bkey", "doc"), measures = Seq("n"))
      .select(col("band"), col("bkey"), col("doc"))
      .localCheckpoint(false)
    val hot = m.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") >= 2 && col("sz") <= maxBucket)
      .select(col("band"), col("bkey"))
    // the semi-join prunes singleton buckets (the overwhelming majority)
    // BEFORE the self-join's shuffle; the join itself touches only hot
    // buckets' members
    val hotMembers = m.join(hot, Seq("band", "bkey"), "left_semi")
    hotMembers.as("a")
      .join(hotMembers.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** FLEET-wide near-dup-index maintenance: [[followIndex]] over N
    * stores through ONE checkpoint ([[graft.sources.CdcMultiSource]]) —
    * the index-family twin of [[followFleetRollup]], completing the
    * reference's one-table-per-cluster story
    * (/root/reference/README.md:55-62) for the dedup surface. The index
    * keys are `(_store, band, bkey)`: per-store ATTRIBUTION rides the
    * shared index, so one store's DELETE WHERE retracts exactly its own
    * bucket rows (signed summation is per-key, and the origin store is
    * part of the key) while a fleet-wide candidate query just aggregates
    * the `_store` dimension away. Admission control, per-store pins,
    * crash/replay, and the segment algebra all delegate to the fleet
    * source and [[upsertSegment]] unchanged — each micro-batch carries
    * one store's signed changes, which land as one O(delta) segment. */
  def followFleetIndex(spark: SparkSession, storePaths: Seq[String],
                       indexPath: String, checkpointDir: String,
                       trigger: Trigger = Trigger.AvailableNow(),
                       maxFilesPerTrigger: Option[Int] = None,
                       maxBytesPerTrigger: Option[Long] = None,
                       compactOver: Int = 8,
                       baseFileBytes: Long = DefaultBaseFileBytes,
                       months: Option[String] = None,
                       startingSnapshots: Option[Seq[String]] = None): StreamingQuery = {
    // corpus-scale fleet bootstrap: [[seedFleetIndex]] pins every store
    // and builds the shared census in ONE batch job; `startingSnapshots`
    // (positional, one pin per store) switches every child source to
    // changes-after-its-pin, so no streaming bootstrap runs
    var inc: String = null   // resolved on first batch — metadata exists by then
    val reader = spark.readStream.format("graft-cdc")
      .option("paths", storePaths.mkString(","))
      .option("initialLoad", startingSnapshots.isEmpty.toString)
    startingSnapshots.foreach(ps => reader.option("startingSnapshots", ps.mkString(",")))
    months.foreach(m => reader.option("months", m))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-fleet-index-${incarnationOf(indexPath)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (inc == null) inc = lineageOf(batch.sparkSession, checkpointDir)
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = graft.store.ChangeFeedQuery
          .bucketRows(batch.withColumn("_s", sign), carry = Seq("_s", "_store"))
          .groupBy(col("_store"), col("band"), col("bkey"))
          .agg(sum(col("_s")).as("n"))
        upsertSegment(batch.sparkSession, delta, batchId, indexPath, inc,
          keys = Seq("_store", "band", "bkey"), measures = Seq("n"),
          compactOver = compactOver, baseFileBytes = baseFileBytes)
      }
      .start()
  }

  /** Build the index BASE in one batch job over a pinned snapshot — the
    * corpus-scale bootstrap (see [[followIndex]]): one map-only
    * signature pass + one aggregation over the snapshot, written as the
    * `seed-0` part that every later segment and compaction merges from
    * (it resolves as a base older than batch 0). Pin the snapshot
    * FIRST, seed, then start `followIndex(…, startingSnapshot =
    * Some(pin))` — the pin is the caller's to drop once the stream's
    * offset passes its first complete form. Refuses a non-empty index
    * (seeding under live parts would double-count).
    *
    * `months` MUST equal the follow's scope: the follow's increments are
    * month-pruned at the source, so an unscoped seed under a scoped
    * follow (or vice versa) is equal to NEITHER rebuild — the seed
    * census filters its snapshot to the same `ym` scope, file-pruned at
    * the manifest like the stream's worklists. */
  def seedIndex(spark: SparkSession, storePath: String, snapshotId: String,
                indexPath: String, months: Option[String] = None,
                bands: Int = 2): Unit = {
    val (fs, root) = fsOf(spark, indexPath)
    // completeness is _SUCCESS-gated like every other part: a seed job
    // that crashed mid-write leaves an incomplete dir no reader sees,
    // and a RE-RUN overwrites it instead of wedging on "already has parts"
    require(partsOf(fs, root, "seg-").isEmpty && partsOf(fs, root, "base-").isEmpty &&
      !fs.exists(new org.apache.hadoop.fs.Path(root, "seed-0/_SUCCESS")),
      s"index at $indexPath already has parts — seedIndex is for an empty index")
    pinBands(spark, indexPath, bands)
    graft.store.ChangeFeedQuery
      .bucketRows(snapshotRows(spark, storePath, snapshotId, months), bands = bands)
      .groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(root, "seed-0").toString)
  }

  /** Pin the LSH band configuration durably under the index root: the
    * band count changes every bucket key's meaning, so a seed at one
    * banding followed at another would silently mix incomparable keys —
    * first writer pins, every later seed/follow must match (the same
    * contract as the months spec pin). */
  private def pinBands(spark: SparkSession, indexPath: String, bands: Int): Unit = {
    val (fs, root) = fsOf(spark, indexPath)
    val f = new org.apache.hadoop.fs.Path(root, "_bands")
    graft.sources.CdcStreamProvider.readPinFile(fs, f) match {
      case Some(prev) =>
        require(prev == bands.toString,
          s"index at $indexPath was built with bands=$prev but this job " +
            s"declares bands=$bands — band keys are incomparable across " +
            "configurations; recalibrate into a NEW index path (seedIndex at " +
            "the new bands + followIndex from the pin)")
      case None =>
        fs.mkdirs(root)
        graft.sources.CdcStreamProvider.writePinFile(fs, f, bands.toString)
    }
  }

  /** A pinned snapshot's rows, optionally month-scoped: the scope prunes
    * at the MANIFEST (files never mix months — the same soundness
    * argument as the CDC source's worklist filter), so a month-scoped
    * seed never opens an out-of-scope file. */
  private def snapshotRows(spark: SparkSession, storePath: String,
                           snapshotId: String, months: Option[String]): DataFrame =
    months match {
      case None => TraceStore.readSnapshot(spark, storePath, snapshotId)
      case Some(spec) =>
        val ok = graft.sources.CdcStreamProvider.monthsPredicate(spec)
        val pfx = s"${graft.schema.TraceSchema.PartitionCol}="
        val keys = TraceStore.snapshotKeys(storePath, snapshotId)
          .filter(k => ok(k.takeWhile(_ != '/').stripPrefix(pfx)))
        TraceStore.readKeys(spark, storePath, keys,
          s"snapshot $snapshotId (months=$spec)")
    }

  /** The fleet form of [[seedIndex]]: pin EVERY store, build the shared
    * `(_store, band, bkey)` census over all the pins in one parallel
    * batch job, and return the (storePath → pin) handoff for
    * `followFleetIndex(…, startingSnapshots = Some(pins))`. Same
    * contract as the single-store seed: the pins are the caller's to
    * drop once each child's offset passes its first complete form, a
    * non-empty index refuses (completeness is `_SUCCESS`-gated, so a
    * crashed seed job just re-runs), and `months` must equal the
    * follow's scope (see [[seedIndex]]).
    *
    * The census is built in CHUNKS of `censusChunk` stores: a single
    * N-way union would grow one Spark plan linearly in fleet size (fine
    * at N≈10², an analyzer wall at 10³+), so each chunk's partial
    * census materializes under `_seed-census/` and one bounded final
    * plan merges the ⌈N/chunk⌉ partials into `seed-0`. `_store` is part
    * of the census key and each store lands in exactly one chunk, so
    * the partials are disjoint and the merge is a plain re-aggregation.
    * Crash-safe: only `seed-0/_SUCCESS` makes the seed visible; a
    * re-run clears the scratch dir and overwrites. */
  def seedFleetIndex(spark: SparkSession, storePaths: Seq[String],
                     indexPath: String, months: Option[String] = None,
                     censusChunk: Int = 16): Seq[(String, String)] = {
    require(storePaths.nonEmpty, "seedFleetIndex needs at least one store")
    require(censusChunk >= 1, s"censusChunk must be positive, got $censusChunk")
    val (fs, root) = fsOf(spark, indexPath)
    require(partsOf(fs, root, "seg-").isEmpty && partsOf(fs, root, "base-").isEmpty &&
      !fs.exists(new org.apache.hadoop.fs.Path(root, "seed-0/_SUCCESS")),
      s"index at $indexPath already has parts — seedFleetIndex is for an empty index")
    // pin FIRST (all stores), then census: each child's first diff has
    // an immutable base even if a store mutates mid-census
    val pins = storePaths.map(p => p -> TraceStore.snapshot(p))
    def censusOf(group: Seq[(String, String)]): DataFrame =
      group.map { case (p, pin) =>
        graft.store.ChangeFeedQuery.bucketRows(
          snapshotRows(spark, p, pin, months).withColumn("_store", lit(p)),
          carry = Seq("_store"))
      }.reduce(_ unionByName _)
        .groupBy(col("_store"), col("band"), col("bkey"))
        .agg(count(lit(1)).as("n"))
    val seedDir = new org.apache.hadoop.fs.Path(root, "seed-0").toString
    val groups = pins.grouped(censusChunk).toSeq
    if (groups.size == 1) censusOf(groups.head).write.mode("overwrite").parquet(seedDir)
    else {
      val scratch = new org.apache.hadoop.fs.Path(root, "_seed-census")
      fs.delete(scratch, true)
      val chunkDirs = groups.zipWithIndex.map { case (g, i) =>
        val d = new org.apache.hadoop.fs.Path(scratch, s"chunk-$i").toString
        censusOf(g).write.mode("overwrite").parquet(d)
        d
      }
      spark.read.parquet(chunkDirs: _*)
        .groupBy(col("_store"), col("band"), col("bkey"))
        .agg(sum(col("n")).as("n"))
        .write.mode("overwrite").parquet(seedDir)
      fs.delete(scratch, true)
      ()
    }
    pins
  }

  /** The seed (as a base older than every batch id) plus the complete
    * `base-` parts, ascending. */
  private def basesOf(fs: org.apache.hadoop.fs.FileSystem,
                      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val seed = new org.apache.hadoop.fs.Path(root, "seed-0")
    val s = if (fs.exists(new org.apache.hadoop.fs.Path(seed, "_SUCCESS")))
      Seq((-1L, seed)) else Seq.empty
    s ++ partsOf(fs, root, "base-")
  }

  /** Complete (`_SUCCESS`-present) parts with the given name prefix
    * under a segmented-index root, ascending by batch id. */
  private def partsOf(fs: org.apache.hadoop.fs.FileSystem,
                      root: org.apache.hadoop.fs.Path,
                      prefix: String): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix)) n.drop(prefix.length).toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)

  /** One maintenance step of the SEGMENTED signed index (see
    * [[followIndex]]): append the batch's signed delta as segment
    * `seg-<batchId>` (O(delta)), or — when the live segment count would
    * exceed `compactOver` — fold base + segments + delta into
    * `base-<batchId>` (the background merge). Lineage-pinned,
    * future-id-guarded, and replay-idempotent exactly like
    * [[upsertDelta]]; pruning keeps the previous base and its segment
    * tail until a LATER state change commits, so the one batch that can
    * replay always finds its merge inputs. */
  /** Target bytes of merged INPUT per base-part file — sizes the fold's
    * write parallelism (see the compaction branch of [[upsertSegment]]). */
  val DefaultBaseFileBytes: Long = 64L << 20

  private[graft] def upsertSegment(spark: SparkSession, delta: DataFrame,
                                       batchId: Long, indexPath: String,
                                       incarnation: String, keys: Seq[String],
                                       measures: Seq[String], compactOver: Int,
                                       baseFileBytes: Long = DefaultBaseFileBytes): Unit = {
    val (fs, root) = fsOf(spark, indexPath)
    val incFile = new org.apache.hadoop.fs.Path(root, "_incarnation")
    if (fs.exists(incFile)) {
      val in = fs.open(incFile)
      val prev = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
      require(prev == incarnation,
        s"index at $indexPath belongs to checkpoint lineage '$prev' but this " +
        s"query runs under '$incarnation' — batch ids are incomparable across " +
        "lineages; clear the index path or restore the original checkpoint")
    } else {
      fs.mkdirs(root)
      val out = fs.create(incFile, true)
      try out.write(incarnation.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val bases = basesOf(fs, root)
    val segs = partsOf(fs, root, "seg-")
    require((bases ++ segs).forall(_._1 <= batchId),
      s"index at $indexPath has a part ahead of batch $batchId — the checkpoint " +
      "was wiped in place and batch ids restarted; clear the index path or " +
      "restore the original checkpoint")
    // replay of an already-committed batch: rebuild nothing (identical by
    // construction), and never rewrite a dir a reader may hold
    if ((bases ++ segs).exists(_._1 == batchId)) return
    val curBase = bases.lastOption
    val live = segs.filter { case (id, _) => curBase.forall(_._1 < id) }
    def readParts(ps: Seq[org.apache.hadoop.fs.Path]): Option[DataFrame] =
      if (ps.isEmpty) None else Some(spark.read.parquet(ps.map(_.toString): _*))
    def drop(p: org.apache.hadoop.fs.Path): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), false)
      fs.delete(p, true)
      ()
    }
    if (live.size + 1 > compactOver) {
      // background merge: base ⊎ segments ⊎ delta → new base; emptied
      // buckets leave the index here. The fold is the index-proportional
      // step — a single-task write would serialize a corpus-sized bucket
      // table through one core at 100 TB — so size the write by the
      // merged INPUT bytes (an upper bound on the folded index): ~one
      // baseFileBytes-sized file per task, multi-file base parts.
      // Readers already treat every part as a directory (readIndex,
      // basesOf) and the seed writes in parallel the same way.
      val inputs = curBase.map(_._2).toSeq ++ live.map(_._2)
      val inputBytes = inputs.map(p => fs.getContentSummary(p).getLength).sum
      val targetParts = math.max(1L,
        math.ceil(inputBytes.toDouble / baseFileBytes).toLong).min(Int.MaxValue).toInt
      val aggs = measures.map(m => sum(col(m)).as(m))
      val folded = readParts(inputs)
        .map(_.unionByName(delta)).getOrElse(delta)
        .groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        // the FIRST measure is the group's signed row count ([[upsertDelta]]'s
        // convention): zero ⇒ every contributing row was retracted ⇒ the
        // group leaves, and its other measures are zero by the same algebra
        .filter(col(measures.head) =!= 0L)
      // under the aggregation's own shuffle width, coalesce — the fold
      // stays one shuffle and its reduce side IS the write; a base wider
      // than the shuffle width re-partitions by key so every task still
      // writes ~baseFileBytes
      val shuffleWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val sized =
        if (targetParts <= shuffleWidth) folded.coalesce(targetParts)
        else folded.repartition(targetParts, keys.map(col): _*)
      sized.write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(root, s"base-$batchId").toString)
      // sweep crash orphans: an incomplete (_SUCCESS-less) part below
      // this batch is a dead mid-write remnant — replays overwrite their
      // OWN id, so nothing running can still claim it. Compaction-time
      // only (the single maintenance writer is here, not mid-write).
      fs.listStatus(root).toSeq
        .filter(st => st.isDirectory &&
          !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .foreach { st =>
          val n = st.getPath.getName
          val id = Seq("seg-", "base-").collectFirst {
            case p if n.startsWith(p) => n.drop(p.length).toLongOption
          }.flatten
          if (id.exists(_ < batchId)) { fs.delete(st.getPath, true); () }
        }
    } else {
      // plain segment append: cost ∝ the batch's changed rows, never the
      // index — zero-net rows drop, negative (retraction) rows KEEP. A
      // row is zero-net only when EVERY measure nets to zero: a same-key
      // replace can leave n = 0 with a nonzero secondary measure, and
      // dropping it would lose the secondary's change
      delta.filter(measures.map(m => col(m) =!= 0L).reduce(_ || _))
        .coalesce(1)
        .write.mode("overwrite").parquet(new org.apache.hadoop.fs.Path(root, s"seg-$batchId").toString)
    }
    // prune: keep the newest TWO bases (the seed counts as one) and
    // every segment newer than the OLDER kept base — the replayable
    // batch (only the latest) can be a compaction, whose rebuild
    // re-reads the previous base + its tail. _SUCCESS goes first so a
    // crash mid-delete leaves the dir invisible. With a SINGLE base (the
    // first compaction of an unseeded index) the just-merged tail gets
    // the same one-cycle grace concurrent readers rely on elsewhere:
    // floor -1 keeps it until a second base exists (bounded — the next
    // compaction prunes it).
    val keptBases = basesOf(fs, root).takeRight(2)
    val floor = if (keptBases.size >= 2) keptBases.head._1 else -1L
    basesOf(fs, root).dropRight(2).foreach(b => drop(b._2))
    partsOf(fs, root, "seg-").filter(_._1 <= floor).foreach(s => drop(s._2))
  }

  /** Read the current maintained band-bucket index: newest complete base
    * ⊎ later segments, signed-summed (merge-on-read — segment count is
    * bounded by the maintainer's `compactOver`). The result is the same
    * table a from-scratch rebuild produces; execute it within one
    * maintenance cycle of resolution (pruning keeps a one-base grace
    * window, same discipline as [[readRollup]]). */
  def readIndex(spark: SparkSession, indexPath: String,
                keys: Seq[String] = Seq("band", "bkey"),
                measures: Seq[String] = Seq("n")): DataFrame = {
    val (fs, root) = fsOf(spark, indexPath)
    val bases = basesOf(fs, root)
    val curBase = bases.lastOption
    val segs = partsOf(fs, root, "seg-")
      .filter { case (id, _) => curBase.forall(_._1 < id) }
    val parts = curBase.map(_._2).toSeq ++ segs.map(_._2)
    require(parts.nonEmpty, s"no complete index part under $indexPath")
    val df = spark.read.parquet(parts.map(_.toString): _*)
    // keys/measures are declared, not inferred from column position: a
    // part written with a different shape must fail here, not mis-group
    require(df.columns.toSet == (keys ++ measures).toSet &&
      df.columns.length == keys.size + measures.size,
      s"index at $indexPath has columns [${df.columns.mkString(", ")}] but the " +
        s"read declares keys=[${keys.mkString(", ")}] measures=[${measures.mkString(", ")}] — " +
        "pass the keys/measures the maintainer writes (fleet indexes carry _store)")
    // a freshly folded (or seeded) index with no later segments IS the
    // merged state — the fold already signed-summed and zero-filtered —
    // so the common just-compacted read skips the aggregation shuffle
    if (segs.isEmpty) df.select((keys ++ measures).map(col): _*)
    else {
      val aggs = measures.map(m => sum(col(m)).as(m))
      df.groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .filter(col(measures.head) =!= 0L)
    }
  }

  /** Continuous replication of a trace STORE over the reference's HTTP
    * bulk-insert transport — the CDC completion of its pipeline: where
    * [[start]] ships newly rotated FILES, this follows the store itself
    * (including its own maintenance) and posts each micro-batch's
    * changes as JSONEachRow with a CollapsingMergeTree-style `_sign`
    * column (+1 insert / −1 delete — the ClickHouse collapsing
    * convention, so the receiving table can be a CollapsingMergeTree
    * that nets deletions out on merge). Idempotency ids are scoped by
    * the checkpointed batch id (`cdc-<id>/partition/chunk/hash`), the
    * same at-least-once-never-loss contract as the ingest transport;
    * a compaction between offsets diffs to nothing and posts nothing.
    * Scale: each batch posts only the CHANGES (file-set-pruned), so
    * replicating a 100 TB store costs its change rate, not its size. */
  def replicateChanges(spark: SparkSession, storePath: String,
                       http: graft.sources.HttpBulkSink.Config,
                       checkpointDir: String,
                       initialLoad: Boolean = true,
                       trigger: Trigger = Trigger.AvailableNow(),
                       maxFilesPerTrigger: Option[Int] = None,
                       maxBytesPerTrigger: Option[Long] = None): StreamingQuery = {
    val reader = spark.readStream.format("graft-cdc")
      .option("path", storePath)
      .option("initialLoad", initialLoad.toString)
    // at scale the bootstrap must ride the bounded-chunk path — one
    // table-sized POST loop would defeat the admission control
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-replicate-${incarnationOf(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val signed = batch
          .withColumn("_sign",
            when(col("_change") === "insert", lit(1)).otherwise(lit(-1)))
          // the wire payload is the replica table's columns + _sign; the
          // feed's commit metadata is reader-side bookkeeping, not data
          .drop("_change", "_commit_snapshot", "_commit_ts")
        // empty diffs post nothing (append() only flushes non-empty
        // partition buffers), so maintenance noise never reaches the wire
        graft.sources.HttpBulkSink.append(signed, http,
          batchId = Some(s"cdc-$batchId"))
      }
      .start()
  }

  /** FLEET replication — the reference's actual multi-cluster
    * deployment: one receiving table per cluster (`CLICKHOUSE_TABLE`
    * per converter instance, /root/reference/README.md:55-62), here one
    * table per STORE with a single checkpoint
    * ([[graft.sources.CdcMultiSource]]) instead of N loose consumers.
    * `tables` is positional, one per store (the same contract as the
    * fleet source's pins — appended stores extend it at the end); each
    * row routes to its origin store's table via the `_store` tag, and
    * idempotency ids are scoped `cdc-<batchId>-<storeIdx>` so a
    * restarted checkpoint replays the identical rows under the
    * identical keys — receiver-side insert dedup yields exactly-once
    * PER TABLE. Admission control bounds the batch (default: one store
    * advances per trigger), maintenance noise diffs to nothing, and a
    * store's DELETE WHERE lands as −1 signs only on its own table. */
  def replicateFleetChanges(spark: SparkSession, storePaths: Seq[String],
                            tables: Seq[String],
                            http: graft.sources.HttpBulkSink.Config,
                            checkpointDir: String,
                            initialLoad: Boolean = true,
                            trigger: Trigger = Trigger.AvailableNow(),
                            maxFilesPerTrigger: Option[Int] = None,
                            maxBytesPerTrigger: Option[Long] = None): StreamingQuery = {
    require(storePaths.nonEmpty, "replicateFleetChanges needs at least one store")
    require(tables.size == storePaths.size,
      s"tables names ${tables.size} receiving tables for ${storePaths.size} " +
        "stores — the list is positional, one table per store")
    val tableOf = storePaths.zip(tables).toMap
    val reader = spark.readStream.format("graft-cdc")
      .option("paths", storePaths.mkString(","))
      .option("initialLoad", initialLoad.toString)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    reader
      .load()
      .writeStream
      .queryName(s"trace-cdc-fleet-replicate-${incarnationOf(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // route by origin store: under the default admission (one store
        // per trigger) this is ONE slice; the distinct is a driver-side
        // peek at ≤ N store tags, never data-sized
        val present = batch.select("_store").distinct()
          .collect().map(_.getString(0)).sorted
        present.foreach { p =>
          val i = storePaths.indexOf(p)
          val signed = batch.filter(col("_store") === p)
            .withColumn("_sign",
              when(col("_change") === "insert", lit(1)).otherwise(lit(-1)))
            .drop("_change", "_commit_snapshot", "_commit_ts", "_store")
          graft.sources.HttpBulkSink.append(signed,
            http.copy(table = tableOf(p)),
            batchId = Some(s"cdc-$batchId-$i"))
        }
      }
      .start()
  }
}

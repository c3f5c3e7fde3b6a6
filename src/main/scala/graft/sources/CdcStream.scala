package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{Metadata, StringType, StructField, StructType}
import graft.store.TraceStore

/** `graft-cdc` — a Structured Streaming SOURCE over the trace store's
  * snapshot-diff change feed: the streaming completion of the batch CDC
  * surface ([[TraceStore.readChangesBetween]] / [[TraceStore.advanceCursor]]),
  * and the stream-shaped form of the reference's continuous-ETL framing
  * (/root/reference/trace-converter.py:66-72 tails a growing input and
  * ships increments; README.md:193-206 frames the whole pipeline as a
  * follow-the-changes loop).
  *
  * {{{
  * spark.readStream.format("graft-cdc")
  *   .option("path", storePath)          // required
  *   .option("initialLoad", "true")      // bootstrap: full snapshot as inserts
  *   .option("maxFilesPerTrigger", "64") // bound each bootstrap micro-batch
  *   .load()                              // columns: store schema + ym + _change
  * }}}
  *
  * Design (the Delta-CDF / FileStreamSource pattern, re-derived for this
  * store's manifest model):
  *
  *  - '''Offset = a pin THIS stream created.''' [[CdcOffset]] names a
  *    durable manifest under `_snapshots/`; the pin is what makes
  *    `getBatch` replayable after a crash — every file either manifest
  *    references is still live or retired, so the SAME diff recomputes
  *    forever. The source only ever advances to pins it created itself
  *    (never binds to a user pin or another stream's pin, so no other
  *    actor's GC can invalidate a checkpointed offset), and snapshot ids
  *    are never reused ([[TraceStore.snapshot]]'s tombstone scan), so an
  *    offset in the checkpoint log can never be re-bound.
  *  - '''Admission control via the engine''' (`SupportsAdmissionControl`,
  *    like FileStreamSource): the engine hands `latestOffset` the last
  *    processed offset, so the source is stateless across restarts —
  *    resume position lives in the engine's own offset log, nowhere
  *    else. An idle store returns the start offset unchanged and pins
  *    nothing.
  *  - '''getBatch(a, b) = readChangesBetween(a, b)''' — file-set-pruned
  *    signed row diff: cost ∝ files that changed, never the table; a
  *    compaction between two offsets cancels row-for-row and delivers
  *    an EMPTY batch. At 100 TB the untouched bulk of the store never
  *    appears in any micro-batch's plan.
  *  - '''Bounded bootstrap''': with `maxFilesPerTrigger`, the
  *    `initialLoad` arrives as sorted-manifest slices (sub-snapshot
  *    offsets `{"snapshot":…,"upto":n}`) of at most that many files per
  *    micro-batch; the manifest is read ONCE per snapshot and cached
  *    (immutable by construction). `Trigger.AvailableNow` runs every
  *    chunk to the prepared target before terminating
  *    (`SupportsTriggerAvailableNow`).
  *  - '''commit(end) garbage-collects this stream's own pins''' below
  *    the committed offset (tracked durably under the stream's
  *    checkpoint `sources/` metadata dir, so GC survives restarts) and
  *    vacuums unreferenced retired files. The engine calls commit(N-1)
  *    when it constructs batch N, so GC lags one batch: at most one
  *    superseded own pin is outstanding at any time (bounded, not
  *    growing). User pins are never touched — N independent readers
  *    coexist, each paying only the retired files its own lag keeps
  *    alive. Residual: a crash in the two-filesystem-op window between
  *    pin creation and its ownership marker leaks that one pin (visible
  *    in `--list-snapshots`, reclaimable with `--drop-snapshot`).
  *  - '''Schema is fixed at stream start''' (Spark's streaming
  *    contract). If the store evolves mid-stream, the next batch fails
  *    loudly with a restart instruction — the restarted stream resumes
  *    from the checkpointed offset under the evolved schema (the feed
  *    reads old files through rename aliases, so replay is lossless).
  *
  * Maintenance cadence contract: polling (`latestOffset`) runs
  * recoverAttempts-guarded manifest listings, which is the same
  * single-maintenance-writer contract every store reader documents —
  * run compaction/erasure between triggers (e.g. from the consuming
  * job, or pause the trigger), not concurrently with one.
  */
final class CdcSource(
    sqlContext: SQLContext,
    path: String,
    metadataPath: String,
    startingSnapshot: Option[String],
    initialLoad: Boolean,
    cleanupCommitted: Boolean,
    maxFilesPerTrigger: Option[Int])
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val spark: SparkSession = sqlContext.sparkSession

  override val schema: StructType = CdcStreamProvider.feedSchema(path)

  // ---- durable record of the pins THIS stream created, under the
  // stream's own checkpoint metadata dir (per-stream by construction,
  // survives restarts, shares the checkpoint's filesystem)
  private val fs = new org.apache.hadoop.fs.Path(metadataPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pinsDir = new org.apache.hadoop.fs.Path(metadataPath, "pins")

  // a startingSnapshot is only consumed by the stream's FIRST batch; once
  // this stream has ever pinned an offset, the starting pin may have been
  // legitimately dropped and its absence must not block restarts
  startingSnapshot.filter(_ => !fs.exists(pinsDir)).foreach { id =>
    require(TraceStore.listSnapshots(path).contains(id),
      s"startingSnapshot '$id' is not a pinned snapshot of $path")
  }

  private def markCreated(id: String): Unit = {
    fs.mkdirs(pinsDir)
    fs.create(new org.apache.hadoop.fs.Path(pinsDir, id), true).close()
  }

  private def ownPins(): Seq[String] =
    if (!fs.exists(pinsDir)) Seq.empty
    else fs.listStatus(pinsDir).toSeq.map(_.getPath.getName)
      .filter(_.matches("s\\d{6,}"))

  private def num(id: String): Long = id.drop(1).toLong

  /** Pin the current state as an OWN snapshot (marked for commit-GC). */
  private def pinOwn(): CdcOffset = {
    val id = TraceStore.snapshot(path)
    markCreated(id)
    CdcOffset(id)
  }

  // manifest cache: one metadata read per snapshot id for the whole
  // bootstrap (manifests are immutable), instead of one per chunk
  @volatile private var keysCache: (String, IndexedSeq[String]) = null
  private def keysOf(id: String): IndexedSeq[String] = {
    val c = keysCache
    if (c != null && c._1 == id) c._2
    else {
      val ks = TraceStore.snapshotKeys(path, id)
      keysCache = (id, ks)
      ks
    }
  }

  // Trigger.AvailableNow: the run's end state, frozen at the first
  // latestOffset call (start-aware, so an idle run pins nothing)
  @volatile private var availableNowPending = false
  @volatile private var availableNowTarget: Option[CdcOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowPending = true
    availableNowTarget = None
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): OffsetV2 = CdcOffset.Start

  /** The next offset after `start` — at most one bounded step. Fresh
    * streams pin the current state (first chunk of it when bootstrap
    * chunking applies); mid-bootstrap advances one chunk of the SAME
    * pin; complete offsets re-pin only when the live file set changed,
    * else echo `start` verbatim (idle = no batch, no pin). */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // the engine passes null (not initialOffset) before the first batch
    val s = Option(start).map(CdcOffset.of).getOrElse(CdcOffset.Start)
    val chunk = limit match {
      case mf: ReadMaxFiles => Some(mf.maxFiles())
      case _ => None
    }
    def firstChunkOf(o: CdcOffset): CdcOffset = chunk match {
      case Some(n) if initialLoad && keysOf(o.snapshotId).size > n =>
        CdcOffset(o.snapshotId, Some(n))
      case _ => o
    }
    val target = availableNowTarget
    val next: CdcOffset = s match {
      // fresh stream: pin the current state (or serve the frozen target)
      case CdcOffset(id0, _) if num(id0) == 0 =>
        firstChunkOf(target.getOrElse(pinOwn()))
      // mid-bootstrap: one more chunk of the same immutable manifest
      case CdcOffset(id, Some(k)) if k < keysOf(id).size =>
        val m = keysOf(id).size
        CdcOffset(id, Some(math.min(m, k + chunk.getOrElse(m))))
      // complete (chunked-complete or plain): advance only on change
      case CdcOffset(id, _) => target match {
        case Some(t) => if (t.snapshotId == id) s else t
        case None =>
          if (TraceStore.snapshotMatchesLive(path, id)) s else pinOwn()
      }
    }
    if (availableNowPending && target.isEmpty) {
      // freeze the run's end state: the complete form of the offset the
      // first poll produced (chunks of it still flow batch by batch)
      availableNowTarget = Some(CdcOffset(next.snapshotId))
      availableNowPending = false
    }
    next
  }

  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "graft-cdc implements SupportsAdmissionControl; the engine calls " +
        "latestOffset(start, limit) instead of getOffset")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endOff = CdcOffset.of(end)
    val endId = endOff.snapshotId
    // the engine may hand initialOffset back as a real start; it means
    // "nothing delivered yet", i.e. the same thing as None
    val from = start.map(CdcOffset.of).filter(o => num(o.snapshotId) > 0)
    val df = (from, endOff.upTo) match {
      // bootstrap chunk: sorted-manifest slice of the pinned snapshot
      case (f, Some(k)) =>
        val j = f match {
          case Some(CdcOffset(`endId`, Some(prev))) => prev
          case None => 0
          case Some(other) => throw new IllegalStateException(
            s"graft-cdc: bootstrap chunk of $endId cannot follow offset ${other.json}")
        }
        if (j >= k) null
        else TraceStore.readKeys(spark, path,
          keysOf(endId).slice(j, k), s"snapshot $endId")
          .withColumn("_change", lit("insert"))
      case (Some(s), None) if s.snapshotId == endId => null
      case (Some(s), None) =>
        TraceStore.readChangesBetween(spark, path, s.snapshotId, endId)
      case (None, None) if initialLoad =>
        // CDC bootstrap in one piece (no maxFilesPerTrigger): the
        // consumer materializes state from one full load, then follows
        // increments — the first batch is the pinned table AS inserts
        TraceStore.readSnapshot(spark, path, endId)
          .withColumn("_change", lit("insert"))
      case (None, None) => startingSnapshot match {
        case Some(s) => TraceStore.readChangesBetween(spark, path, s, endId)
        case None => null
      }
    }
    if (df == null) Shim.emptyStreaming(spark, schema)
    else {
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val want = schema.fields.map(f => (f.name, f.dataType)).toSeq
      if (got != want)
        throw new IllegalStateException(
          s"graft-cdc: store schema evolved mid-stream (stream declared " +
            s"${want.map(_._1).mkString(",")}; feed now produces " +
            s"${got.map(_._1).mkString(",")}). Restart the stream to adopt " +
            "the evolved schema — it resumes from the checkpointed offset " +
            "with no loss (old files read through rename aliases).")
      Shim.streamingOfRows(spark, df)
    }
  }

  override def commit(end: OffsetV1): Unit = if (cleanupCommitted) {
    val endN = num(CdcOffset.of(end).snapshotId)
    val dropped = ownPins().filter(num(_) < endN)
    dropped.foreach { id =>
      TraceStore.dropSnapshot(path, id)
      fs.delete(new org.apache.hadoop.fs.Path(pinsDir, id), false)
    }
    if (dropped.nonEmpty) TraceStore.vacuumSnapshots(path)
  }

  override def stop(): Unit = ()

  override def toString: String = s"CdcSource[$path]"
}

/** Offset = the id of a snapshot pin this stream created; during an
  * admission-controlled bootstrap, `upTo` marks how many of the pinned
  * manifest's sorted files have been delivered so far (see
  * [[CdcSource]]). */
final case class CdcOffset(snapshotId: String, upTo: Option[Int] = None)
    extends OffsetV1 {
  override def json: String = upTo match {
    case Some(k) => s"""{"snapshot":"$snapshotId","upto":$k}"""
    case None    => s"""{"snapshot":"$snapshotId"}"""
  }
}

object CdcOffset {
  /** The before-anything offset `latestOffset` receives on a fresh
    * stream (never logged by the engine as a batch boundary). */
  val Start: CdcOffset = CdcOffset("s000000")
  private val Pat = """\{\s*"snapshot"\s*:\s*"(s\d{6,})"\s*\}""".r
  private val PatUpTo =
    """\{\s*"snapshot"\s*:\s*"(s\d{6,})"\s*,\s*"upto"\s*:\s*(\d+)\s*\}""".r
  def parse(json: String): CdcOffset = json.trim match {
    case Pat(id) => CdcOffset(id)
    case PatUpTo(id, k) => CdcOffset(id, Some(k.toInt))
    case other =>
      throw new IllegalArgumentException(s"not a graft-cdc offset: $other")
  }
  /** The engine hands back offsets from its log as SerializedOffset —
    * resolve either form through the json representation. */
  def of(o: OffsetV2): CdcOffset = o match {
    case c: CdcOffset => c
    case other => parse(other.json())
  }
}

/** `spark.readStream.format("graft-cdc")` provider (DataSourceRegister
  * via META-INF/services, same as `graft-ndjson`).
  *
  * Options:
  *  - `path` (required): the trace-store root.
  *  - `initialLoad` (default false): bootstrap — the full table at the
  *    stream's first pinned snapshot, as inserts. Overrides
  *    `startingSnapshot`.
  *  - `startingSnapshot` (default `latest`): `latest` starts the feed
  *    at the stream's first trigger (changes AFTER start); an explicit
  *    pinned id starts it there (first batch = changes from that pin;
  *    the pin stays the USER's to manage — drop it after the first
  *    batch commits).
  *  - `cleanupCommitted` (default true): on commit, drop the pins this
  *    stream created below the committed offset and vacuum.
  *  - `maxFilesPerTrigger` (default unbounded): admission control for
  *    the `initialLoad` bootstrap — the pinned table is delivered as
  *    sorted-manifest slices of at most this many files per micro-batch,
  *    so a 100 TB bootstrap is bounded batches, not one table-sized
  *    one. Post-bootstrap change batches are sized by the store's own
  *    maintenance cadence and are not chunked.
  */
final class CdcStreamProvider extends StreamSourceProvider with DataSourceRegister {
  import CdcStreamProvider._

  override def shortName(): String = "graft-cdc"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), feedSchema(pathOf(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toInt)
    maxFiles.foreach(n => require(n > 0, s"maxFilesPerTrigger must be positive, got $n"))
    new CdcSource(sqlContext, path, metadataPath,
      parameters.get("startingSnapshot").filterNot(_ == "latest"),
      parameters.get("initialLoad").exists(_.toBoolean),
      parameters.get("cleanupCommitted").forall(_.toBoolean),
      maxFiles)
  }
}

object CdcStreamProvider {
  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc requires option 'path'"))

  /** The feed's fixed schema: the store's logical columns (manifest
    * metadata stripped — storage detail, not user surface) + the ym
    * partition column + `_change` ("insert" | "delete"). */
  def feedSchema(tablePath: String): StructType = {
    val stored = TraceStore.storedSchema(tablePath)
    StructType(
      stored.fields.map(_.copy(metadata = Metadata.empty)) :+
        StructField(graft.schema.TraceSchema.PartitionCol, StringType) :+
        StructField("_change", StringType))
  }
}

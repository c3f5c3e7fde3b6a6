package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2}
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
  *   .option("initialLoad", "true")      // first batch = full snapshot as inserts
  *   .load()                              // columns: store schema + ym + _change
  * }}}
  *
  * Design (the Delta-CDF streaming-source pattern, re-derived for this
  * store's manifest model):
  *
  *  - '''Offset = a pinned snapshot.''' [[CdcOffset]] names a durable
  *    manifest under `_snapshots/`; the pin is what makes `getBatch`
  *    replayable after a crash — every file either manifest references
  *    is still live or retired, so the SAME diff recomputes forever.
  *    Snapshot ids are monotonic and never reused
  *    ([[TraceStore.snapshot]]'s high-water mark), so an offset in the
  *    checkpoint log can never be re-bound to a different state.
  *  - '''getOffset pins at most one snapshot per trigger''', and none
  *    at all while the store is idle ([[TraceStore.snapshotIfChanged]]
  *    compares the live file set against the newest manifest first).
  *  - '''getBatch(a, b) = readChangesBetween(a, b)''' — file-set-pruned
  *    signed row diff: cost ∝ files that changed, never the table; a
  *    compaction between two offsets cancels row-for-row and delivers
  *    an EMPTY batch. At 100 TB the untouched bulk of the store never
  *    appears in any micro-batch's plan.
  *  - '''commit(end) garbage-collects this stream's own pins''' below
  *    the committed offset (tracked durably under the stream's
  *    checkpoint `sources/` metadata dir, so GC survives restarts) and
  *    vacuums unreferenced retired files. The engine calls commit(N-1)
  *    when it constructs batch N, so GC lags one batch: at most one
  *    superseded own pin is outstanding at any time (bounded, not
  *    growing). User pins and other streams'
  *    pins are never touched — N independent readers coexist, each
  *    paying only the retired files its own lag keeps alive.
  *  - '''Schema is fixed at stream start''' (Spark's streaming
  *    contract). If the store evolves mid-stream, the next batch fails
  *    loudly with a restart instruction — the restarted stream resumes
  *    from the checkpointed offset under the evolved schema (the feed
  *    reads old files through rename aliases, so replay is lossless).
  *
  * Maintenance cadence contract: polling (`getOffset`) runs
  * [[TraceStore.recoverAttempts]]-guarded manifest listings, which is
  * the same single-maintenance-writer contract every store reader
  * documents — run compaction/erasure between triggers (e.g. from the
  * consuming job, or pause the trigger), not concurrently with one.
  */
final class CdcSource(
    sqlContext: SQLContext,
    path: String,
    metadataPath: String,
    startingSnapshot: Option[String],
    initialLoad: Boolean,
    cleanupCommitted: Boolean,
    maxFilesPerTrigger: Option[Int]) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession

  override val schema: StructType = CdcStreamProvider.feedSchema(path)

  // ---- durable record of the pins THIS stream created, under the
  // stream's own checkpoint metadata dir (per-stream by construction,
  // survives restarts, shares the checkpoint's filesystem)
  private val fs = new org.apache.hadoop.fs.Path(metadataPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pinsDir = new org.apache.hadoop.fs.Path(metadataPath, "pins")

  private def markCreated(id: String): Unit = {
    fs.mkdirs(pinsDir)
    fs.create(new org.apache.hadoop.fs.Path(pinsDir, id), true).close()
  }

  private def ownPins(): Seq[String] =
    if (!fs.exists(pinsDir)) Seq.empty
    else fs.listStatus(pinsDir).toSeq.map(_.getPath.getName)
      .filter(_.matches("s\\d{6,}"))

  private def num(id: String): Long = id.drop(1).toLong

  // ---- bootstrap admission control (maxFilesPerTrigger): the engine's
  // v1 getOffset() takes no "current position", so the source tracks the
  // last offset a batch actually covered — in memory on the hot path,
  // mirrored to a progress file under the checkpoint so a restart whose
  // batches were all committed resumes the bootstrap where it stopped
  // (a restart with an uncommitted batch is repositioned by the replayed
  // getBatch before getOffset runs). A lost/corrupt progress file only
  // re-delivers bootstrap chunks — at-least-once, never loss.
  private val progressFile = new org.apache.hadoop.fs.Path(metadataPath, "progress")
  @volatile private var lastSeen: Option[CdcOffset] = None

  /** (snapshot number, chunk position) order; a complete offset outranks
    * any chunk of the same snapshot. */
  private def ord(o: CdcOffset): (Long, Long) =
    (num(o.snapshotId), o.upTo.map(_.toLong).getOrElse(Long.MaxValue))

  private def recordProgress(o: CdcOffset): Unit = {
    // never regress: a replayed/stale batch must not pull the bootstrap
    // cursor backwards (it would re-chunk already-delivered slices)
    import scala.math.Ordering.Implicits._
    lastSeen.orElse(readProgress()).filter(p => ord(p) >= ord(o)) match {
      case Some(p) => lastSeen = Some(p); return
      case None =>
    }
    lastSeen = Some(o)
    val tmp = new org.apache.hadoop.fs.Path(metadataPath, ".progress.tmp")
    val out = fs.create(tmp, true)
    try out.write(o.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(progressFile, false)
    fs.rename(tmp, progressFile)
  }

  private def readProgress(): Option[CdcOffset] =
    if (!fs.exists(progressFile)) None
    else {
      val in = fs.open(progressFile)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      try Some(CdcOffset.parse(txt)) catch { case _: IllegalArgumentException => None }
    }

  private def poll(): CdcOffset = {
    val (id, created) = TraceStore.snapshotIfChanged(path)
    if (created) markCreated(id)
    CdcOffset(id)
  }

  override def getOffset: Option[OffsetV1] = Some {
    lastSeen.orElse(readProgress()) match {
      // mid-bootstrap: advance by one bounded chunk of the SAME pin
      // (a restart without maxFilesPerTrigger finishes in one chunk)
      case Some(CdcOffset(id, Some(k))) if k < TraceStore.snapshotFileCount(path, id) =>
        val m = TraceStore.snapshotFileCount(path, id)
        CdcOffset(id, Some(math.min(m, k + maxFilesPerTrigger.getOrElse(m))))
      // bootstrap complete: poll normally, but an unchanged store must
      // return the SAME (chunked) offset, not a differently-spelled one
      case Some(o @ CdcOffset(id, Some(_))) =>
        val next = poll()
        if (next.snapshotId == id) o else next
      // fresh stream with admission control: pin, emit the first chunk
      case None if initialLoad && maxFilesPerTrigger.isDefined =>
        val pinned = poll()
        val m = TraceStore.snapshotFileCount(path, pinned.snapshotId)
        if (m > maxFilesPerTrigger.get)
          CdcOffset(pinned.snapshotId, Some(maxFilesPerTrigger.get))
        else pinned
      case _ => poll()
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endOff = CdcOffset.of(end)
    val endId = endOff.snapshotId
    start.map(CdcOffset.of).foreach(recordProgress) // reconcile after restart
    recordProgress(endOff)
    val df = (start.map(CdcOffset.of), endOff.upTo) match {
      // bootstrap chunk: sorted-manifest slice of the pinned snapshot
      case (from, Some(k)) =>
        val j = from match {
          case Some(CdcOffset(`endId`, Some(prev))) => prev
          case None => 0
          case Some(other) => throw new IllegalStateException(
            s"graft-cdc: bootstrap chunk of $endId cannot follow offset ${other.json}")
        }
        if (j >= k) null
        else TraceStore.readSnapshotSlice(spark, path, endId, j, k)
          .withColumn("_change", lit("insert"))
      case (Some(s), None) if s.snapshotId == endId => null
      case (Some(s), None) =>
        TraceStore.readChangesBetween(spark, path, s.snapshotId, endId)
      case (None, None) if initialLoad =>
        // CDC bootstrap: the consumer materializes state from one full
        // load, then follows increments — so the first batch is the
        // pinned table AS inserts (equivalent to any earlier load plus
        // the changes since, by the snapshot-diff algebra)
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

/** Offset = the id of a durable store snapshot pin; during an
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
  *  - `initialLoad` (default false): first micro-batch = the full table
  *    at the stream's first pinned snapshot, as inserts (the CDC
  *    consumer bootstrap). Overrides `startingSnapshot`.
  *  - `startingSnapshot` (default `latest`): `latest` starts the feed
  *    at the stream's first trigger (changes AFTER start); an explicit
  *    pinned id starts it there (first batch = changes from that pin).
  *  - `cleanupCommitted` (default true): on commit, drop the pins this
  *    stream created below the committed offset and vacuum.
  *  - `maxFilesPerTrigger` (default unbounded): admission control for
  *    the `initialLoad` bootstrap — the pinned table is delivered as
  *    sorted-manifest slices of at most this many files per micro-batch
  *    (sub-snapshot offsets `{"snapshot":…,"upto":n}`, progress mirrored
  *    under the checkpoint), so a 100 TB bootstrap is bounded batches,
  *    not one table-sized one. Post-bootstrap change batches are sized
  *    by the store's own maintenance cadence and are not chunked.
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
    val starting = parameters.get("startingSnapshot").filterNot(_ == "latest")
    starting.foreach { id =>
      require(TraceStore.listSnapshots(path).contains(id),
        s"startingSnapshot '$id' is not a pinned snapshot of $path")
    }
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toInt)
    maxFiles.foreach(n => require(n > 0, s"maxFilesPerTrigger must be positive, got $n"))
    new CdcSource(sqlContext, path, metadataPath,
      starting,
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

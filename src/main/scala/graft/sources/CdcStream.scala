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
    cleanupCommitted: Boolean) extends Source {

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

  override def getOffset: Option[OffsetV1] = {
    val (id, created) = TraceStore.snapshotIfChanged(path)
    if (created) markCreated(id)
    Some(CdcOffset(id))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endId = CdcOffset.of(end).snapshotId
    val df = start.map(o => CdcOffset.of(o).snapshotId) match {
      case Some(s) if s == endId => null
      case Some(s) => TraceStore.readChangesBetween(spark, path, s, endId)
      case None if initialLoad =>
        // CDC bootstrap: the consumer materializes state from one full
        // load, then follows increments — so the first batch is the
        // pinned table AS inserts (equivalent to any earlier load plus
        // the changes since, by the snapshot-diff algebra)
        TraceStore.readSnapshot(spark, path, endId)
          .withColumn("_change", lit("insert"))
      case None => startingSnapshot match {
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

/** Offset = the id of a durable store snapshot pin (see [[CdcSource]]). */
final case class CdcOffset(snapshotId: String) extends OffsetV1 {
  override def json: String = s"""{"snapshot":"$snapshotId"}"""
}

object CdcOffset {
  private val Pat = """\{\s*"snapshot"\s*:\s*"(s\d{6,})"\s*\}""".r
  def parse(json: String): CdcOffset = json.trim match {
    case Pat(id) => CdcOffset(id)
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
    new CdcSource(sqlContext, path, metadataPath,
      starting,
      parameters.get("initialLoad").exists(_.toBoolean),
      parameters.get("cleanupCommitted").forall(_.toBoolean))
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

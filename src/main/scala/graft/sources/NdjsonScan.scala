package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns,
  SupportsReportStatistics}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.StructType

/** Batch read path of the `graft-ndjson` connector
  * (`spark.read.format("graft-ndjson").schema(s).load(dir)`).
  *
  * Schema-on-read without inference (SURVEY §2 A5: the reference declares
  * its column whitelist up front, `/root/reference/trace-converter.py:
  * 115-119`) — an explicit `.schema(...)` is required; there is no
  * sampling pass. Three scan-side behaviors the driver's generic file
  * source can't give this format:
  *
  *  - **Batch-commit validity** (A11/A13): the sink names part files
  *    `part-NNNNN-<queryId>.ndjson` and publishes `_SUCCESS-<queryId>`
  *    only after every task of that batch committed. With the default
  *    `committedOnly=true`, part files of an unmarked batch — a write job
  *    that died after some task commits — are invisible, so readers see
  *    whole batches or nothing, matching the reference's whole-file
  *    INSERT atomicity. Non-part-named files (raw rotated trace logs)
  *    carry no marker and are always visible.
  *  - **Column pruning inside the parse**: the pruned required schema
  *    reaches JacksonParser, which skips over undeclared JSON keys
  *    token-by-token instead of materializing them (A6's projection
  *    whitelist, enforced at the byte level).
  *  - **Size statistics** (`SupportsReportStatistics`): summed file bytes
  *    feed the optimizer's broadcast decision, so a small trace directory
  *    joins as the build side without a manual hint.
  *
  * One InputPartition per file: the reference rotates at "10s of
  * thousands" of rows (`README.md:201-203`), so file grain IS good task
  * grain; a 1000-executor cluster reading a month of rotated traces gets
  * one task per file with no line-boundary splitting problem.
  */
final class NdjsonScanBuilder(path: String, schema: StructType, committedOnly: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  require(schema.nonEmpty,
    "graft-ndjson read requires an explicit .schema(...) — schema-on-read, no inference pass")
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new NdjsonScan(path, required, committedOnly, Shim.sessionTimeZone)
}

final class NdjsonScan(path: String, required: StructType, committedOnly: Boolean,
    timeZoneId: String) extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ndjson $path ReadSchema: ${required.simpleString}"

  // part files carry the batch queryId between the partition index and the
  // extension; anything else (raw rotated trace logs) has no batch to gate on
  private val PartName = """part-\d+-(.+)\.ndjson""".r

  private def visibleFiles(): Seq[Path] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) return Seq.empty
    if (Files.isRegularFile(dir)) return Seq(dir)
    // Files.list returns a Stream that must be CLOSED (it holds a
    // directory descriptor); draining via iterator alone leaks one fd
    // per planning/statistics call
    val listing = Files.list(dir)
    val all =
      try listing.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      finally listing.close()
    val names = all.map(_.getFileName.toString).toSet
    all.filter { p =>
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".") && (n match {
        case PartName(qid) => !committedOnly || names.contains(s"_SUCCESS-$qid")
        case _             => true
      })
    }.sortBy(_.getFileName.toString)
  }

  override def planInputPartitions(): Array[InputPartition] =
    visibleFiles().map(p => NdjsonInputPartition(p.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new NdjsonReaderFactory(required, timeZoneId)

  override def estimateStatistics(): Statistics = new Statistics {
    // a file can vanish between listing and sizing (concurrent abort /
    // external cleanup) — treat it as absent, never fail planning
    private val bytes = visibleFiles().map { p =>
      try Files.size(p) catch { case _: java.io.IOException => 0L }
    }.sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

final case class NdjsonInputPartition(file: String) extends InputPartition

final class NdjsonReaderFactory(schema: StructType, timeZoneId: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NdjsonPartitionReader(p.asInstanceOf[NdjsonInputPartition].file, schema, timeZoneId)
}

final class NdjsonPartitionReader(file: String, schema: StructType, timeZoneId: String)
    extends PartitionReader[InternalRow] {
  private val in = Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)
  private val parser = new Shim.NdjsonLineParser(schema, timeZoneId)
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!rows.hasNext) {
      val line = in.readLine()
      if (line == null) return false
      if (line.nonEmpty) rows = parser.parse(line)
    }
    current = rows.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

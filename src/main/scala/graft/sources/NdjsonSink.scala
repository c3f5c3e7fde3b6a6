package graft.sources

import java.io.BufferedWriter
import java.io.OutputStreamWriter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** JSONEachRow bulk sink as a DataSource V2 connector
  * (`df.write.format("graft-ndjson").mode("append").save(dir)`).
  *
  * The reference's sink is one HTTP POST of a whole file in ClickHouse
  * `JSONEachRow` format per rotated trace file, all-or-nothing
  * (`/root/reference/trace-converter.py:66-72`, `README.md:193-206`). This
  * connector is that contract through Spark's native write protocol: each
  * task streams rows as JSON lines (the exact `to_json` serialization —
  * SURVEY §2 A10, session-timezone identical) into a hidden temp file and
  * atomically renames it on task commit, so a reader never observes a
  * partially written file; the driver publishes a per-batch marker
  * `_SUCCESS-<queryId>` once every task of that batch committed (A11's
  * batch-at-once semantics — a batch's `part-*-<queryId>` files are valid
  * iff its marker exists, which stays true across appends), plus the
  * conventional `_SUCCESS` for single-batch consumers. The commit
  * coordinator guarantees one committed attempt per partition, so
  * speculative or retried tasks can't double-publish. In a deployment where the target is
  * a remote store, `NdjsonDataWriter` is the slot that holds the
  * connection — same lifecycle, buffered-whole-batch POST on commit
  * (SURVEY §7.4-4); here it lands on the filesystem, which also makes the
  * output directly re-ingestable by the engine's own NDJSON scan (A5).
  */
class NdjsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ndjson"
  // no inference pass in either direction: writes take the query's schema
  // (ACCEPT_ANY_SCHEMA), reads require a user-declared schema (A5) — so
  // the table's own schema stays empty and supportsExternalMetadata
  // routes the user's .schema(...) into getTable
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-ndjson requires .save(path) / .load(path)")
    new NdjsonTable(path, schema)
  }
}

final class NdjsonTable(path: String, declaredSchema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graft-ndjson:$path"
  override def schema(): StructType = declaredSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NdjsonScanBuilder(path, declaredSchema,
      options.getBoolean("committedOnly", true))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        // capture the session timezone at plan time so executors serialize
        // timestamps exactly as the session's to_json would
        new NdjsonWrite(path, info.schema(), info.queryId(), Shim.sessionTimeZone)
    }
}

final class NdjsonWrite(path: String, schema: StructType, queryId: String,
    timeZoneId: String) extends Write {
  override def toBatch: BatchWrite = new NdjsonBatchWrite(path, schema, queryId, timeZoneId)
}

final case class NdjsonCommit(file: String) extends WriterCommitMessage

final class NdjsonBatchWrite(path: String, schema: StructType, queryId: String,
    timeZoneId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new NdjsonWriterFactory(path, schema, queryId, timeZoneId)
  // task files are already rename-committed; publish this batch's marker
  // (validity key for its part files across later appends) + the
  // conventional _SUCCESS
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    Files.write(Paths.get(path, s"_SUCCESS-$queryId"), Array.emptyByteArray)
    Files.write(Paths.get(path, "_SUCCESS"), Array.emptyByteArray)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case NdjsonCommit(f) => Files.deleteIfExists(Paths.get(f))
      case _ =>
    }
}

final class NdjsonWriterFactory(path: String, schema: StructType, queryId: String,
    timeZoneId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, schema, queryId, timeZoneId, partitionId, taskId)
}

final class NdjsonDataWriter(dir: String, schema: StructType, queryId: String,
    timeZoneId: String, partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  // temp name carries taskId (unique per attempt); final name does not, so
  // whichever attempt the coordinator lets commit produces the same file
  private val tmp = Paths.get(dir, f".part-$partitionId%05d-$taskId.ndjson.tmp")
  private val fin = Paths.get(dir, f"part-$partitionId%05d-$queryId.ndjson")
  Files.createDirectories(Paths.get(dir))
  private val out = new BufferedWriter(new OutputStreamWriter(
    Files.newOutputStream(tmp), StandardCharsets.UTF_8))
  private val gen = new Shim.NdjsonLineGen(schema, out, timeZoneId)

  override def write(row: InternalRow): Unit = gen.write(row)
  override def commit(): WriterCommitMessage = {
    gen.close()
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    NdjsonCommit(fin.toString)
  }
  // the flush inside close() can itself be the failure (disk full) — the
  // temp cleanup must still run
  override def abort(): Unit =
    try gen.close()
    catch { case _: java.io.IOException => }
    finally Files.deleteIfExists(tmp)
  override def close(): Unit =
    try gen.close()
    finally Files.deleteIfExists(tmp)
}

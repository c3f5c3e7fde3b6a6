package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal (binary) column plumbing (SURVEY.md §2 Tier C / builder
  * prompt): image/audio/video payloads ride as opaque `binary` columns with
  * typed metadata; decode / feature-extraction runs partition-local.
  *
  * The container has no media codecs, so [[decodeStub]] is a clearly-marked
  * deterministic fake — but the Spark-side plumbing (schema, batch shape,
  * partition-local execution, feature vector output) is real and tested.
  * At 100 TB the pattern is: binary column in parquet (so column pruning
  * skips the bytes unless referenced), `repartition` to bound task input
  * size, `mapPartitions` so any native decoder initializes once per
  * partition rather than once per row.
  */
object Multimodal {

  /** Typed media row: payload + metadata, as it would land from ingestion. */
  case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])

  /** Fixed-shape decoded features (stand-in for image embeddings / audio
    * frames). Deterministic fake: byte histogram moments. */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
                           feature: Array[Float])

  /** STUB decode: a real build would call an image/audio codec here (the
    * container ships none). Deterministic byte-level moments keep the
    * pipeline testable end-to-end. Partition-local: one decoder init per
    * partition, rows streamed — the shape a JNI/FFI codec needs. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // decoder init would happen here, once per partition
    rows.map { r =>
      val bs = r.payload
      // single pass, Long accumulator (an Int sum overflows past ~16 MB)
      var sum = 0L; var mx = 0; var mn = 255
      var i = 0
      while (i < bs.length) {
        val v = bs(i) & 0xff
        sum += v; if (v > mx) mx = v; if (v < mn) mn = v
        i += 1
      }
      val n = math.max(bs.length, 1)
      val mean = (sum.toDouble / n).toFloat
      val (fmn, fmx) = if (bs.isEmpty) (0f, 0f) else (mn.toFloat, mx.toFloat)
      MediaFeatures(r.media_id, r.mime, bs.length, Array(mean, fmn, fmx, n.toFloat))
    }
  }

  /** Full pipeline: DataFrame with a binary column → partition-local decode
    * → typed features. */
  def extractFeatures(df: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.mapPartitions(decodeStub)
  }

  /** One sampled video frame: payload slice + position metadata. */
  case class MediaFrame(media_id: Long, frame_idx: Int, offset: Long,
                        frame: Array[Byte])

  /** STUB frame sampling (video → every k-th frame): a real build parses
    * the container's seek table; the stub treats the payload as fixed-size
    * frames. The Spark shape is the real thing — a generator (UDTF-style
    * flatMap) that expands one row into many, partition-local so a
    * demuxer would initialize once per partition. */
  def sampleFramesStub(rows: Iterator[MediaRow], frameBytes: Int,
                       everyNth: Int): Iterator[MediaFrame] = {
    // demuxer init would happen here, once per partition
    rows.flatMap { r =>
      val n = r.payload.length / frameBytes
      (0 until n).by(everyNth).iterator.map { f =>
        val off = f.toLong * frameBytes
        MediaFrame(r.media_id, f, off,
          r.payload.slice(off.toInt, off.toInt + frameBytes))
      }
    }
  }

  /** Frame-sample pipeline over a bounded-size repartition: numPartitions
    * bounds per-task payload volume (the knob that keeps task input ≈
    * constant as the corpus grows — at 100 TB this is a repartition on a
    * size-aware key, not a fixed count). */
  def sampleFrames(df: Dataset[MediaRow], frameBytes: Int, everyNth: Int,
                   numPartitions: Int): Dataset[MediaFrame] = {
    import df.sparkSession.implicits._
    df.repartition(numPartitions)
      .mapPartitions(rs => sampleFramesStub(rs, frameBytes, everyNth))
  }

  /** STUB resize: a real build decodes + rescales pixels; the stub scales
    * the feature vector's shape metadata. Demonstrates the batched
    * execution contract (the Scala analogue of a pandas-UDF batch): rows
    * are processed `batchSize` at a time through one call, the shape a
    * vectorized/FFI kernel needs, while the iterator keeps streaming —
    * no whole-partition materialization. */
  def resizeBatched(df: Dataset[MediaFeatures], targetDim: Int,
                    batchSize: Int = 64): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one vectorized kernel call per batch would happen here
        batch.map { f =>
          val out = java.util.Arrays.copyOf(f.feature, targetDim)
          f.copy(feature = out)
        }
      }
    }
  }

  // ---------------------------------------------------------------- queries entry
  /** Binary-column metadata projection over documents-as-blobs: the
    * metadata/pruning half of the multimodal story, fully SQL-expressible
    * (byte lengths via octet_length on both engines). */
  def q38BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("octet_length(text)").as("n_bytes"),
        length(col("text")).as("n_chars_m"),
        lit("text/plain").as("mime"),
        (expr("octet_length(text)").cast("long") * 2654435761L % 1000003L).as("fake_feature"))
      .orderBy(col("doc_id"))

  val q38Sql: String =
    """SELECT doc_id, octet_length(text::BLOB) AS n_bytes, length(text) AS n_chars_m,
      |  'text/plain' AS mime,
      |  (octet_length(text::BLOB) * 2654435761) % 1000003 AS fake_feature
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q168: frame inventory through the gate
  /** Frame-sample inventory over documents-as-blobs — puts the REAL
    * multimodal execution path (binary payload → size-bounded repartition
    * → partition-local [[sampleFramesStub]] generator → per-media
    * aggregate) through the DuckDB oracle gate, not just a spec. The
    * payload is the document's UTF-8 bytes standing in for a video
    * container (no codecs in this container); 256-byte "frames", every
    * 4th sampled. The oracle can't run the generator, but every inventory
    * statistic it emits — sampled-frame count, last frame index/offset,
    * bytes materialized — is exact integer arithmetic on octet_length, so
    * the gate checks the generator's expansion logic (floor-division
    * frame count, stride sampling, offset layout) row-for-row.
    *
    * Scale: the aggregate is a map-side-combined count/max/sum keyed on
    * media_id, partitioning inherited from the repartition that bounded
    * per-task payload bytes; nothing in the plan holds more than one
    * frame at a time. */
  def q168FrameInventory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), lit("video/fake").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    sampleFrames(media, frameBytes = 256, everyNth = 4, numPartitions = 32)
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"),
        max(col("frame_idx")).as("last_idx"),
        max(col("offset")).as("last_off"),
        sum(expr("octet_length(frame)")).as("bytes_read"))
      .orderBy(col("media_id"))
  }

  val q168Sql: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |             octet_length(text::BLOB) // 256 AS total_frames
      |           FROM documents),
      |f AS (SELECT media_id, total_frames,
      |             (total_frames - 1) // 4 AS last_step
      |      FROM m WHERE total_frames >= 1)
      |SELECT media_id,
      |  (last_step + 1)::BIGINT AS n_sampled,
      |  (last_step * 4)::INTEGER AS last_idx,
      |  (last_step * 4 * 256)::BIGINT AS last_off,
      |  ((last_step + 1) * 256)::BIGINT AS bytes_read
      |FROM f ORDER BY media_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q38_binary_meta",      q38BinaryMeta _,      Some(q38Sql)),
    ("q168_frame_inventory", q168FrameInventory _, Some(q168Sql)),
  )
}

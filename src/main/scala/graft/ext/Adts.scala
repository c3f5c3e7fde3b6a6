package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pure-byte ADTS (AAC transport) frame indexing — the compressed-audio
  * third of the container family next to [[Mp4]] and [[Mkv]], with its own
  * binary grammar again: ADTS is a self-synchronizing FRAME stream (no
  * global index), each frame led by a 12-bit syncword header that encodes
  * its own total length — so demuxing is a linear header walk, 7 or 9
  * bytes read per frame, no codec involved. The walk recovers every
  * frame's exact byte offset, total/payload length, header form
  * (CRC-protected or not), sampling-frequency index, channel config and
  * buffer fullness — what a frame sampler or an FFI AAC decoder seeks to.
  * This retires the last demux stub: codec-level PCM DECODE of AAC remains
  * impossible in this sandbox (no codec shipped), but frame INDEXING is
  * now real for audio exactly as it is for video containers.
  *
  * Same scale contract as [[Mp4]]/[[Mkv]]: partition-local, one payload
  * held at a time, parser state is one 9-byte header; the per-media
  * aggregate is map-side combined. Unlike moov-led MP4, ADTS must be read
  * sequentially — but each step reads only the header bytes, so an object
  * store that supports ranged reads still skips every payload.
  */
object Adts {

  /** One indexed ADTS frame. `hdr_len` is 7 (protection_absent) or 9
    * (header CRC present); `frame_len` INCLUDES the header, matching the
    * on-wire field; the codec payload is [offset+hdr_len, offset+frame_len). */
  final case class AdtsFrame(media_id: Long, frame_idx: Int, offset: Long,
                             frame_len: Int, hdr_len: Int, sfreq_idx: Int,
                             channels: Int, fullness: Int, rdb: Int)

  /** Walk the frame headers: syncword (12 bits of 1s + layer 00) checked
    * per frame, 13-bit frame length spread over bytes 3–5, 11-bit buffer
    * fullness over bytes 5–6. Stops at the first malformed header or
    * truncated frame — a partial index on mid-stream corruption, empty on
    * non-ADTS input, never a throw (a production demuxer would resync on
    * the next syncword; strict stop is the conservative choice the other
    * container walks share). */
  def parseFrames(mediaId: Long, payload: Array[Byte]): Seq[AdtsFrame] = {
    val out = Seq.newBuilder[AdtsFrame]
    var o = 0
    var idx = 0
    while (o + 7 <= payload.length) {
      val b0 = payload(o) & 0xff
      val b1 = payload(o + 1) & 0xff
      // sync: 0xFFF + layer bits 00 (mask drops the MPEG-version and
      // protection bits, which legally vary per frame)
      if (b0 != 0xff || (b1 & 0xf6) != 0xf0) return out.result()
      val hdrLen = if ((b1 & 0x1) == 1) 7 else 9 // protection_absent=0 → +2 CRC bytes
      val b2 = payload(o + 2) & 0xff
      val b3 = payload(o + 3) & 0xff
      val b4 = payload(o + 4) & 0xff
      val b5 = payload(o + 5) & 0xff
      val b6 = payload(o + 6) & 0xff
      val frameLen = ((b3 & 0x3) << 11) | (b4 << 3) | (b5 >> 5)
      // length covers its own header; a shorter value is structurally
      // invalid and a longer-than-buffer one is a truncated tail
      if (frameLen < hdrLen || o + frameLen > payload.length) return out.result()
      val sfreqIdx = (b2 >> 2) & 0xf
      val channels = ((b2 & 0x1) << 2) | ((b3 >> 6) & 0x3)
      val fullness = ((b5 & 0x1f) << 6) | (b6 >> 2)
      val rdb = (b6 & 0x3) + 1
      out += AdtsFrame(mediaId, idx, o.toLong, frameLen, hdrLen,
        sfreqIdx, channels, fullness, rdb)
      idx += 1
      o += frameLen
    }
    out.result()
  }

  // ------------------------------------------------------------- synthesis (ingest stand-in)
  /** Codec-payload size formula shared with the oracle. */
  def payloadSize(seed: Long, i: Int): Int =
    50 + java.lang.Math.floorMod(seed * 29 + i.toLong * 13, 100L).toInt
  /** Buffer-fullness formula (11-bit field) shared with the oracle. */
  def frameFullness(seed: Long, i: Int): Int =
    java.lang.Math.floorMod(seed * 7 + i.toLong * 31, 2048L).toInt
  /** Frames per synthesized stream: 20–32, seed-dependent. */
  def frameCount(seed: Long): Int = 20 + java.lang.Math.floorMod(seed, 13L).toInt
  /** Every 4th frame carries the CRC header form (hdr_len 9 vs 7), so both
    * header lengths are exercised in every stream. */
  def headerLen(i: Int): Int = if (i % 4 == 0) 9 else 7

  /** Deterministic minimal-but-valid ADTS stream: MPEG-4, AAC-LC profile,
    * sfreq index 4 (44.1 kHz), 2 channels, alternating CRC/no-CRC header
    * forms, zeroed codec payloads (and zeroed CRC bytes — the walk indexes
    * headers, it does not verify CRCs, exactly like a seeking demuxer). */
  def synthAdts(seed: Long): Array[Byte] = {
    val n = frameCount(seed)
    val bos = new java.io.ByteArrayOutputStream(n * 160)
    (0 until n).foreach { i =>
      val hdr = headerLen(i)
      val frameLen = hdr + payloadSize(seed, i)
      val fullness = frameFullness(seed, i)
      bos.write(0xff)
      bos.write(0xf0 | 0x8 | (if (hdr == 7) 1 else 0)) // MPEG-4, layer 00, protection bit
      bos.write((0x1 << 6) | (4 << 2) | 0x0)           // AAC-LC, sfreq 4, chan high bit 0
      bos.write((2 << 6) | ((frameLen >> 11) & 0x3))   // 2 channels, len high bits
      bos.write((frameLen >> 3) & 0xff)
      bos.write(((frameLen & 0x7) << 5) | ((fullness >> 6) & 0x1f))
      bos.write(((fullness & 0x3f) << 2) | 0x0)        // rdb-1 = 0
      (0 until frameLen - 7).foreach(_ => bos.write(0)) // CRC bytes (if any) + payload, zeroed
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------- q205: ADTS index through the gate
  /** REAL ADTS header walk through the DuckDB gate, the audio twin of
    * [[Mp4.q202Mp4Index]]: per document synthesize the deterministic
    * stream ([[synthAdts]], seed = doc_id), walk its frame headers back
    * with [[parseFrames]], and emit exact integer aggregates. The oracle
    * reproduces everything in closed form — a walker that mis-assembles
    * the split 13-bit length field desynchronizes immediately (n_frames
    * collapses), mixing up the 7/9-byte header forms shifts every
    * subsequent offset (off_sum/last_off) and payload_sum, and the 11-bit
    * fullness field spanning two bytes breaks full_sum/full_posw if
    * mis-shifted. Map-only like q202/q203: synth, walk and the per-media
    * aggregate run partition-local with one stream held at a time. */
  def q205AdtsIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap(id => parseFrames(id, synthAdts(id)))
      }
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_len")).as("bytes_total"),
        sum(col("frame_len") - col("hdr_len")).as("payload_sum"),
        sum(when(col("hdr_len") === 9, 1L).otherwise(0L)).as("crc_frames"),
        sum(col("offset")).as("off_sum"),
        max(col("offset")).as("last_off"),
        sum(col("fullness")).as("full_sum"),
        sum(col("fullness") * col("frame_idx")).as("full_posw"),
        max(col("sfreq_idx")).as("sf_idx"),
        max(col("channels")).as("n_chan"))
      .orderBy(col("media_id"))
  }

  val q205Sql: String =
    """WITH m AS (SELECT doc_id AS media_id, 20 + doc_id % 13 AS nf FROM documents),
      |s AS (SELECT media_id, g.i AS i,
      |             50 + (media_id * 29 + g.i * 13) % 100 AS psz,
      |             CASE WHEN g.i % 4 = 0 THEN 9 ELSE 7 END AS hdr,
      |             (media_id * 7 + g.i * 31) % 2048 AS fullness
      |      FROM m, generate_series(0, 32) AS g(i) WHERE g.i < nf),
      |z AS (SELECT media_id, i, psz, hdr, fullness, hdr + psz AS flen FROM s),
      |o AS (SELECT media_id, i, psz, hdr, fullness, flen,
      |             coalesce(sum(flen) OVER (PARTITION BY media_id ORDER BY i
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |      FROM z)
      |SELECT media_id, count(*)::BIGINT AS n_frames,
      |  sum(flen)::BIGINT AS bytes_total, sum(psz)::BIGINT AS payload_sum,
      |  sum(CASE WHEN hdr = 9 THEN 1 ELSE 0 END)::BIGINT AS crc_frames,
      |  sum(off)::BIGINT AS off_sum, max(off)::BIGINT AS last_off,
      |  sum(fullness)::BIGINT AS full_sum, sum(fullness * i)::BIGINT AS full_posw,
      |  4 AS sf_idx, 2 AS n_chan
      |FROM o GROUP BY media_id ORDER BY media_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q205_adts_index", q205AdtsIndex _, Some(q205Sql)),
  )
}

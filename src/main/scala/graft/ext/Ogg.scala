package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pure-byte Ogg page indexing (RFC 3533) — the fourth container grammar
  * next to [[Mp4]] (table-led), [[Mkv]] (tag-length-value) and [[Adts]]
  * (self-sync frames): Ogg is a PAGE stream, each page led by a fixed
  * 27-byte header plus a lacing table that encodes the page body length
  * and where packets end inside it. The walk recovers every page's exact
  * byte offset, header/body split, granule position, stream serial, page
  * sequence, BOS/EOS/continuation flags and completed-packet count — the
  * seek index a Vorbis/Opus demuxer or frame sampler works from. No codec
  * involved: codec-level PCM decode stays out of sandbox scope exactly as
  * for AAC/video, but page INDEXING is real.
  *
  * Same scale contract as the sibling walks: partition-local, one payload
  * held at a time, parser state is one header + one ≤255-byte lacing
  * table; page bodies are skipped by length, so an object store with
  * ranged reads never fetches payload bytes.
  */
object Ogg {

  /** One indexed Ogg page. `hdr_len` = 27 + n_segs; the body occupies
    * [offset+hdr_len, offset+hdr_len+body_len). `pkt_ends` counts lacing
    * values < 255 — packets COMPLETED in this page (a trailing 255 means
    * the last packet continues on the next page, whose header then
    * carries the continued flag). */
  final case class OggPage(media_id: Long, page_idx: Int, offset: Long,
                           hdr_len: Int, body_len: Int, granule: Long,
                           serial: Long, seq: Long, continued: Boolean,
                           bos: Boolean, eos: Boolean, n_segs: Int,
                           pkt_ends: Int)

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** Walk the page headers: capture pattern "OggS" + version 0 checked per
    * page; the segment table is read for the body length and packet-end
    * census, the body itself is skipped. Stops at the first malformed or
    * truncated page — partial index on mid-stream corruption, empty on
    * non-Ogg input, never a throw (the conservative strict-stop the other
    * container walks share; a production demuxer would resync on the next
    * capture pattern). CRCs are not verified, exactly like a seeking
    * demuxer. */
  def parsePages(mediaId: Long, payload: Array[Byte]): Seq[OggPage] = {
    val out = Seq.newBuilder[OggPage]
    var o = 0
    var idx = 0
    while (o + 27 <= payload.length) {
      if (payload(o) != 'O' || payload(o + 1) != 'g' ||
          payload(o + 2) != 'g' || payload(o + 3) != 'S' ||
          payload(o + 4) != 0) return out.result()
      val flags = payload(o + 5) & 0xff
      val granule = le64(payload, o + 6)
      val serial = le32(payload, o + 14)
      val seq = le32(payload, o + 18)
      val nSegs = payload(o + 26) & 0xff
      val hdrLen = 27 + nSegs
      if (o + hdrLen > payload.length) return out.result()
      var body = 0
      var ends = 0
      var i = 0
      while (i < nSegs) {
        val lace = payload(o + 27 + i) & 0xff
        body += lace
        if (lace < 255) ends += 1
        i += 1
      }
      if (o + hdrLen + body > payload.length) return out.result()
      out += OggPage(mediaId, idx, o.toLong, hdrLen, body, granule, serial,
        seq, (flags & 0x1) != 0, (flags & 0x2) != 0, (flags & 0x4) != 0,
        nSegs, ends)
      idx += 1
      o += hdrLen + body
    }
    out.result()
  }

  // ------------------------------------------------------------- synthesis (ingest stand-in)
  /** Pages per synthesized stream: 8–18, seed-dependent. */
  def pageCount(seed: Long): Int = 8 + java.lang.Math.floorMod(seed, 11L).toInt
  /** Packets per page: 1–3, page-dependent. */
  def packetCount(seed: Long, i: Int): Int =
    1 + java.lang.Math.floorMod(seed + i.toLong, 3L).toInt
  /** Packet sizes 40–500: sizes ≥ 255 force a 255-lacing + remainder pair
    * (incl. the exact-multiple 0-lacing terminator when size % 255 == 0),
    * so multi-segment lacing is exercised in every stream. */
  def packetSize(seed: Long, i: Int, j: Int): Int =
    40 + java.lang.Math.floorMod(seed * 17 + i.toLong * 7 + j.toLong * 29, 461L).toInt
  /** Granule formula shared with the oracle (monotone per stream). */
  def granuleOf(seed: Long, i: Int): Long = seed * 100 + i.toLong * 48
  /** Stream serial shared with the oracle. */
  def serialOf(seed: Long): Long = java.lang.Math.floorMod(seed * 2654435761L, 1L << 31)

  /** Deterministic minimal-but-valid Ogg stream: version 0, BOS on the
    * first page, EOS on the last, page-contained packets (cross-page
    * continuation is a parser concern covered by OggSpec's handcrafted
    * pages — keeping the fixture continuation-free keeps the oracle in
    * closed form), zeroed CRCs and zeroed packet bytes. */
  def synthOgg(seed: Long): Array[Byte] = {
    val n = pageCount(seed)
    val bos = new java.io.ByteArrayOutputStream(n * 600)
    def w32(v: Long): Unit =
      (0 until 4).foreach(k => bos.write(((v >> (8 * k)) & 0xff).toInt))
    def w64(v: Long): Unit =
      (0 until 8).foreach(k => bos.write(((v >> (8 * k)) & 0xff).toInt))
    (0 until n).foreach { i =>
      val sizes = (0 until packetCount(seed, i)).map(j => packetSize(seed, i, j))
      val laces = sizes.flatMap { sz =>
        Seq.fill(sz / 255)(255) ++ Seq(sz % 255)  // sz%255==0 → 0 terminator
      }
      bos.write('O'); bos.write('g'); bos.write('g'); bos.write('S')
      bos.write(0)                                   // version
      bos.write(if (i == 0) 0x2 else if (i == n - 1) 0x4 else 0x0)
      w64(granuleOf(seed, i))
      w32(serialOf(seed))
      w32(i.toLong)                                  // page sequence
      w32(0L)                                        // CRC zeroed
      bos.write(laces.length)
      laces.foreach(bos.write)
      (0 until sizes.sum).foreach(_ => bos.write(0)) // packet bytes, zeroed
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------- q207: Ogg index through the gate
  /** REAL Ogg page walk through the DuckDB gate, completing the demux
    * family (q202 MP4 tables, q203/q206 EBML blocks, q205 ADTS frames):
    * per document synthesize the deterministic stream ([[synthOgg]],
    * seed = doc_id), walk its pages back with [[parsePages]], and emit
    * exact integer aggregates. The oracle reproduces everything in
    * closed form — a walker that sums the lacing table wrong desyncs
    * immediately (page offsets and n_pages collapse), counting a 255
    * lace as a packet end breaks pkt_ends_sum, and mis-shifting the
    * little-endian granule/serial fields breaks granule_last/serial.
    * Map-only like its siblings: synth, walk and the per-media aggregate
    * run partition-local with one stream held at a time. */
  def q207OggIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap(id => parsePages(id, synthOgg(id)))
      }
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_pages"),
        sum(col("hdr_len") + col("body_len")).as("bytes_total"),
        sum(col("body_len")).as("body_sum"),
        sum(col("n_segs")).as("segs_sum"),
        sum(col("pkt_ends")).as("pkt_sum"),
        sum(col("pkt_ends") * col("page_idx")).as("pkt_posw"),
        sum(col("offset")).as("off_sum"),
        max(col("offset")).as("last_off"),
        sum(when(col("bos"), 1L).otherwise(0L)).as("bos_pages"),
        sum(when(col("eos"), 1L).otherwise(0L)).as("eos_pages"),
        max(col("granule")).as("granule_last"),
        max(col("serial")).as("serial"))
      .orderBy(col("media_id"))
  }

  val q207Sql: String =
    """WITH m AS (SELECT doc_id AS media_id, 8 + doc_id % 11 AS np FROM documents),
      |pg AS (SELECT media_id, g.i AS i, 1 + (media_id + g.i) % 3 AS k
      |       FROM m, generate_series(0, 18) AS g(i) WHERE g.i < np),
      |pk AS (SELECT media_id, i, j.j AS j,
      |              40 + (media_id * 17 + i * 7 + j.j * 29) % 461 AS psz
      |       FROM pg, generate_series(0, 2) AS j(j) WHERE j.j < k),
      |pgz AS (SELECT media_id, i, sum(psz)::BIGINT AS body,
      |               sum(psz // 255 + 1)::BIGINT AS segs,
      |               count(*)::BIGINT AS ends
      |        FROM pk GROUP BY media_id, i),
      |o AS (SELECT media_id, i, body, segs, ends, 27 + segs AS hdr,
      |             coalesce(sum(27 + segs + body) OVER (PARTITION BY media_id
      |               ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |               0)::BIGINT AS off,
      |             max(i) OVER (PARTITION BY media_id) AS last_i
      |      FROM pgz)
      |SELECT media_id, count(*)::BIGINT AS n_pages,
      |  sum(hdr + body)::BIGINT AS bytes_total, sum(body)::BIGINT AS body_sum,
      |  sum(segs)::BIGINT AS segs_sum, sum(ends)::BIGINT AS pkt_sum,
      |  sum(ends * i)::BIGINT AS pkt_posw,
      |  sum(off)::BIGINT AS off_sum, max(off)::BIGINT AS last_off,
      |  1::BIGINT AS bos_pages, 1::BIGINT AS eos_pages,
      |  media_id * 100 + max(i) * 48 AS granule_last,
      |  (media_id * 2654435761) % 2147483648 AS serial
      |FROM o GROUP BY media_id ORDER BY media_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q207_ogg_index", q207OggIndex _, Some(q207Sql)),
  )
}

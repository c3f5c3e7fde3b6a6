package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pure-byte image HEADER indexing — dimensions, bit depth and channel
  * count recovered from JPEG/PNG/GIF container structure without decoding
  * a single pixel. [[Multimodal]]'s q194 is the decode path (JDK ImageIO,
  * whole payload in memory); this is the 100 TB path: a curation pipeline
  * that filters by resolution/aspect/depth ("drop icons", "keep ≥512²")
  * needs only the first few dozen bytes of each image, so on a
  * ranged-read store a corpus-wide dimension census reads KBs per file
  * regardless of image size. Three real binary grammars, one walker:
  *
  *  - JPEG/JFIF: a marker-segment walk (`FF xx` + big-endian u16 length)
  *    until a start-of-frame marker (C0/C1/C2) whose payload carries
  *    precision, height, width, component count — dims sit AFTER
  *    arbitrary APPn/DQT segments, so a real walk (not a fixed offset)
  *    is required.
  *  - PNG: 8-byte signature, then the IHDR chunk (spec-required first):
  *    width/height as big-endian u32, bit depth, color type.
  *  - GIF (87a/89a): fixed 13-byte header + logical screen descriptor,
  *    LITTLE-endian u16 dims (the one LE grammar in the container
  *    family), color resolution packed in bits 6-4 of the flags byte.
  *
  * Scale contract identical to [[Mp4]]/[[Mkv]]/[[Adts]]: the walk is
  * partition-local, one payload held at a time, parser state is a cursor;
  * malformed/truncated input degrades to None (one bad blob cannot kill a
  * task), and the per-format aggregate is map-side combined.
  */
object ImageHeaders {

  /** One sniffed header. `hdr_bytes` is the cursor position after the
    * dims were recovered — the exact number of leading bytes a ranged
    * read needs for this file (the judge of the "KBs per file" claim). */
  final case class ImgHeader(media_id: Long, fmt: String, width: Int,
                             height: Int, depth: Int, ncomp: Int,
                             hdr_bytes: Int)

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u16le(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
    ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Sniff the magic and dispatch; None on anything malformed. */
  def parseHeader(mediaId: Long, p: Array[Byte]): Option[ImgHeader] =
    if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
      parseJpeg(mediaId, p)
    else if (p.length >= 8 && u32be(p, 0) == 0x89504e47L && u32be(p, 4) == 0x0d0a1a0aL)
      parsePng(mediaId, p)
    else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
             p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      parseGif(mediaId, p)
    else None

  /** Marker-segment walk to the first SOF0/SOF1/SOF2. Standalone markers
    * (TEM, RSTn, SOI, EOI) carry no length word; fill bytes (repeated FF)
    * before a marker are legal and skipped. Stops (None) on a malformed
    * length, EOI before any SOF, or entering entropy-coded data (SOS) —
    * a frame header after SOS would be a corrupt stream. */
  private def parseJpeg(id: Long, p: Array[Byte]): Option[ImgHeader] = {
    var o = 2
    while (o + 4 <= p.length) {
      if ((p(o) & 0xff) != 0xff) return None
      while (o < p.length && (p(o) & 0xff) == 0xff) o += 1 // fill bytes
      if (o >= p.length) return None
      val m = p(o) & 0xff
      o += 1
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) {
        if (m == 0xd9) return None // EOI before SOF
      } else {
        if (o + 2 > p.length) return None
        val len = u16be(p, o)
        if (len < 2 || o + len > p.length) return None
        if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
          if (len < 8) return None
          val depth = p(o + 2) & 0xff
          val h = u16be(p, o + 3)
          val w = u16be(p, o + 5)
          val nc = p(o + 7) & 0xff
          if (w == 0 || h == 0 || nc == 0 || len < 8 + 3 * nc) return None
          return Some(ImgHeader(id, "jpeg", w, h, depth, nc, o + len))
        }
        if (m == 0xda) return None // SOS: entropy data, no SOF seen
        o += len
      }
    }
    None
  }

  /** PNG: the spec requires IHDR to be the first chunk; honoring that
    * keeps the ranged read at exactly 33 bytes. CRC is present but not
    * verified — integrity is the store's job, not the census's. */
  private def parsePng(id: Long, p: Array[Byte]): Option[ImgHeader] = {
    if (p.length < 33) return None
    val len = u32be(p, 8)
    val typ = new String(p, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (len != 13L || typ != "IHDR") return None
    val w = u32be(p, 16)
    val h = u32be(p, 20)
    val depth = p(24) & 0xff
    val colorType = p(25) & 0xff
    val nc = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0 || w > 0x7fffffffL || h > 0x7fffffffL) return None
    Some(ImgHeader(id, "png", w.toInt, h.toInt, depth, nc, 33))
  }

  /** GIF header + logical screen descriptor: 13 bytes, little-endian
    * dims, color resolution = bits 6-4 of the flags byte, plus one. */
  private def parseGif(id: Long, p: Array[Byte]): Option[ImgHeader] = {
    if (p.length < 13) return None
    val w = u16le(p, 6)
    val h = u16le(p, 8)
    val flags = p(10) & 0xff
    val depth = ((flags >> 4) & 0x7) + 1
    if (w == 0 || h == 0) return None
    Some(ImgHeader(id, "gif", w, h, depth, 1, 13))
  }

  // ------------------------------------------------------------- deterministic synthesis
  // Closed-form dims the oracle reproduces in SQL (seed = doc_id):
  //   w = 64 + (id*7) % 1000,  h = 48 + (id*11) % 800
  //   fmt = id % 3  (0 jpeg, 1 png, 2 gif)
  //   jpeg: precision 8, ncomp = 1 if id%5==0 else 3
  //   png:  depth 8 or 16 (id%2), colorType cycles {0,2,6} by id%3 → nc {1,3,4}
  //   gif:  depth (id%7)+1, nc 1
  // id % 31 == 0 → payload truncated to 6 bytes → parser must return None
  // (the oracle drops the same ids: flagged degradation through the gate).

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def synthImage(id: Long): Array[Byte] = {
    val w = (64 + (id * 7) % 1000).toInt
    val h = (48 + (id * 11) % 800).toInt
    val full: Array[Byte] = (id % 3) match {
      case 0 =>
        val nc = if (id % 5 == 0) 1 else 3
        val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
          "JFIF".getBytes ++ Array[Byte](0, 1, 2, 0) ++ be16(1) ++ be16(1) ++
          Array[Byte](0, 0)
        val dqt = Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(67) ++
          Array[Byte](0) ++ Array.tabulate(64)(i => ((id + i) % 255).toByte)
        val sof = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(8 + 3 * nc) ++
          Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](nc.toByte) ++
          (1 to nc).flatMap(c => Array[Byte](c.toByte, 0x11, 0)).toArray
        val sos = Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(8) ++
          Array[Byte](1, 1, 0, 0, 63, 0)
        Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ dqt ++ sof ++ sos ++
          Array.tabulate(16)(i => ((id * 3 + i) % 251).toByte) ++
          Array[Byte](0xff.toByte, 0xd9.toByte)
      case 1 =>
        val depth = if (id % 2 == 0) 8 else 16
        val colorType = Seq(0, 2, 6)(((id % 9) / 3).toInt) // id%3==1 here, so id%9 ∈ {1,4,7}
        val ihdr = be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
          Array[Byte](depth.toByte, colorType.toByte, 0, 0, 0) ++ be32(0)
        val idat = be32(4) ++ "IDAT".getBytes ++ be32(id & 0xffffffffL) ++ be32(0)
        val iend = be32(0) ++ "IEND".getBytes ++ be32(0)
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          ihdr ++ idat ++ iend
      case _ =>
        val depth = ((id % 7) + 1).toInt
        val flags = (((depth - 1) << 4) | 0x00) & 0xff
        "GIF89a".getBytes ++ le16(w) ++ le16(h) ++
          Array[Byte](flags.toByte, 0, 0) ++
          Array[Byte](0x3b) // trailer
    }
    if (id % 31 == 0) full.take(6) else full
  }

  // ------------------------------------------------------------- q214: dimension census through the gate
  /** REAL header walks through the DuckDB gate: synthesize the
    * deterministic container ([[synthImage]], seed = doc_id), sniff it
    * back with [[parseHeader]], aggregate exact integers per format. The
    * oracle reproduces every statistic in closed form from the dim
    * formulas — a walker that misread endianness (GIF dims swap), fixed
    * the SOF offset instead of walking segments (w/h shift by the DQT
    * length), miscounted JPEG components or PNG color types, or failed to
    * degrade on the truncated 1-in-31 payloads hash-mismatches. Map-only:
    * synth + walk run partition-local, aggregate is map-side combined. */
  def q214ImageHeader(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.flatMap(id => parseHeader(id, synthImage(id))))
      .toDF()
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n_imgs"),
        sum(col("width").cast("long")).as("sum_w"),
        sum(col("height").cast("long")).as("sum_h"),
        sum(col("width").cast("long") * col("height")).as("sum_area"),
        sum(col("depth").cast("long")).as("sum_depth"),
        sum(col("ncomp").cast("long")).as("sum_ncomp"),
        sum(col("hdr_bytes").cast("long")).as("sum_hdr_bytes"),
        max(col("width")).as("max_w"), max(col("height")).as("max_h"))
      .orderBy(col("fmt"))
  }

  val q214Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS id, doc_id % 3 AS f,
      |         CAST(64 + (doc_id * 7) % 1000 AS INTEGER) AS w,
      |         CAST(48 + (doc_id * 11) % 800 AS INTEGER) AS h
      |  FROM documents WHERE doc_id % 31 <> 0),
      |x AS (
      |  SELECT id, CASE f WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'gif' END AS fmt,
      |         w, h,
      |         CASE f WHEN 0 THEN 8
      |                WHEN 1 THEN CASE WHEN id % 2 = 0 THEN 8 ELSE 16 END
      |                ELSE CAST((id % 7) + 1 AS INTEGER) END AS depth,
      |         CASE f WHEN 0 THEN CASE WHEN id % 5 = 0 THEN 1 ELSE 3 END
      |                WHEN 1 THEN CASE (id % 9) // 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
      |                ELSE 1 END AS ncomp,
      |         CASE f WHEN 0 THEN 2 + 18 + 69 + 2 + 8 + 3 * (CASE WHEN id % 5 = 0 THEN 1 ELSE 3 END)
      |                WHEN 1 THEN 33 ELSE 13 END AS hdr_bytes
      |  FROM m)
      |SELECT fmt, count(*)::BIGINT AS n_imgs,
      |  sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
      |  sum(w::BIGINT * h)::BIGINT AS sum_area,
      |  sum(depth)::BIGINT AS sum_depth, sum(ncomp)::BIGINT AS sum_ncomp,
      |  sum(hdr_bytes)::BIGINT AS sum_hdr_bytes,
      |  max(w) AS max_w, max(h) AS max_h
      |FROM x GROUP BY fmt ORDER BY fmt""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q214_image_header", q214ImageHeader _, Some(q214Sql)),
  )
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pure-byte MP4 (ISO BMFF) container indexing — the video half of the
  * multimodal story made REAL without any codec: frame *indexing* needs
  * only the container's sample tables (`moov/trak/mdia/minf/stbl`), which
  * are plain big-endian structures. Parsing `stsz` (sizes), `stco`/`co64`
  * (chunk offsets), `stsc` (sample→chunk mapping) and `stts` (durations)
  * yields every sample's exact byte offset/size/timestamp — what a frame
  * sampler seeks to before handing slices to an FFI decoder. This replaces
  * the fixed-stride [[Multimodal.sampleFramesStub]] assumption for MP4
  * payloads with the container's true seek table.
  *
  * Scale: parse is partition-local and streaming ([[Multimodal]]'s
  * contract — one payload held at a time, parser state is the sample
  * table, KBs even for hour-long videos); the per-media aggregate is
  * map-side combined. Nothing here reads the `mdat` payload itself, so a
  * 100 TB corpus indexes by reading only `moov` bytes when the storage
  * layer supports ranged reads.
  */
object Mp4 {

  /** One indexed sample (frame) from the container's sample table. */
  final case class Mp4Sample(media_id: Long, sample_idx: Int, chunk_idx: Int,
                             size: Int, offset: Long, duration: Int)

  // ------------------------------------------------------------- byte-level helpers
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
    ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk sibling boxes in [start, end); return (payloadStart, payloadEnd)
    * of the first box named `name`. Handles 64-bit `largesize` (size==1)
    * and to-end-of-file (size==0) encodings; malformed sizes end the walk
    * (truncated input must degrade, not throw — one bad blob in a corpus
    * cannot kill the job). */
  private def findBox(b: Array[Byte], start: Int, end: Int, name: String): Option[(Int, Int)] = {
    var o = start
    while (o + 8 <= end) {
      val size0 = u32(b, o)
      val typ = fourcc(b, o + 4)
      val (hdr, size) =
        if (size0 == 1L && o + 16 <= end) (16, u64(b, o + 8))
        else if (size0 == 0L) (8, (end - o).toLong)
        else (8, size0)
      if (size < hdr || o + size > end) return None // malformed/truncated
      if (typ == name) return Some((o + hdr, o + size.toInt))
      o += size.toInt
    }
    None
  }

  /** Resolve a nested container path, e.g. moov/trak/mdia/minf/stbl. */
  private def findPath(b: Array[Byte], path: Seq[String]): Option[(Int, Int)] =
    path.foldLeft(Option((0, b.length))) {
      case (Some((s, e)), name) => findBox(b, s, e, name)
      case (None, _) => None
    }

  /** Parse the first video/media track's sample table into per-sample
    * rows: exact size, chunk, absolute byte offset and duration for every
    * sample. Returns empty on anything malformed — flagged degradation,
    * like the decode fallbacks in [[Multimodal]]. */
  def parseSampleTable(mediaId: Long, payload: Array[Byte]): Seq[Mp4Sample] = {
    val stbl = findPath(payload, Seq("moov", "trak", "mdia", "minf", "stbl"))
      .getOrElse(return Seq.empty)
    val (ss, se) = stbl

    // stsz: version/flags(4) uniform_size(4) count(4) [sizes]. The count
    // is an untrusted u32: bound it before any allocation sized by it —
    // a crafted blob must degrade to empty, not OOM the executor. The
    // bound differs per branch: non-uniform stores 4·n table bytes that
    // must physically exist in the box, so n is payload-bounded; uniform
    // stores NO per-sample entries, so a moov-only ranged read (the
    // 100 TB access mode — mdat never fetched) legitimately has far more
    // samples than payload bytes — bound it by a fixed sanity cap
    // instead (2^24 frames ≈ 77 h at 60 fps; the expansion is 4 B/sample).
    val sizes: IndexedSeq[Int] = findBox(payload, ss, se, "stsz") match {
      case Some((o, e)) if e - o >= 12 =>
        val uniform = u32(payload, o + 4)
        val n = u32(payload, o + 8)
        if (uniform != 0L) {
          if (n > (1L << 24)) return Seq.empty
          IndexedSeq.fill(n.toInt)(uniform.toInt)
        } else if (n <= payload.length && e - o >= 12 + 4L * n)
          (0 until n.toInt).map(i => u32(payload, o + 12 + 4 * i).toInt)
        else return Seq.empty
      case _ => return Seq.empty
    }

    // stco (u32) / co64 (u64): version/flags(4) count(4) [offsets]
    val chunkOffs: IndexedSeq[Long] = findBox(payload, ss, se, "stco") match {
      case Some((o, e)) if e - o >= 8 =>
        val n = u32(payload, o + 4).toInt
        if (n < 0 || e - o < 8 + 4L * n) return Seq.empty
        (0 until n).map(i => u32(payload, o + 8 + 4 * i))
      case _ => findBox(payload, ss, se, "co64") match {
        case Some((o, e)) if e - o >= 8 =>
          val n = u32(payload, o + 4).toInt
          if (n < 0 || e - o < 8 + 8L * n) return Seq.empty
          (0 until n).map(i => u64(payload, o + 8 + 8 * i))
        case _ => return Seq.empty
      }
    }

    // stsc: version/flags(4) count(4) [(first_chunk, samples_per_chunk,
    // sample_description_index)] — run-length over chunks: entry k applies
    // from its first_chunk until the next entry's
    val stscEntries: IndexedSeq[(Int, Int)] = findBox(payload, ss, se, "stsc") match {
      case Some((o, e)) if e - o >= 8 =>
        val n = u32(payload, o + 4).toInt
        if (n < 0 || e - o < 8 + 12L * n) return Seq.empty
        (0 until n).map(i => (u32(payload, o + 8 + 12 * i).toInt,
          u32(payload, o + 12 + 12 * i).toInt))
      case _ => return Seq.empty
    }

    // stts: version/flags(4) count(4) [(sample_count, sample_delta)] —
    // run-length durations, expanded to per-sample. Run counts are
    // untrusted: the running total is bounded by the sample count BEFORE
    // each expansion, so a hostile count can't drive the allocation.
    val durations: IndexedSeq[Int] = findBox(payload, ss, se, "stts") match {
      case Some((o, e)) if e - o >= 8 =>
        val n = u32(payload, o + 4).toInt
        if (n < 0 || e - o < 8 + 8L * n) return Seq.empty
        val b = IndexedSeq.newBuilder[Int]
        var total = 0L
        var i = 0
        while (i < n) {
          val cnt = u32(payload, o + 8 + 8 * i)
          val delta = u32(payload, o + 12 + 8 * i).toInt
          total += cnt
          if (cnt < 0L || total > sizes.length) return Seq.empty
          var k = 0L
          while (k < cnt) { b += delta; k += 1 }
          i += 1
        }
        b.result()
      case _ => return Seq.empty
    }
    if (durations.length != sizes.length) return Seq.empty

    // expand stsc: samples-per-chunk for each chunk (1-based chunk ids).
    // Entries are untrusted: require at least one, positive per-chunk
    // counts, and strictly ascending first_chunk starting at 1 — anything
    // else degrades to empty rather than overrunning the size table.
    if (stscEntries.isEmpty || stscEntries.head._1 != 1 ||
        stscEntries.exists(_._2 <= 0) ||
        stscEntries.sliding(2).exists(p => p.length == 2 && p(1)._1 <= p(0)._1))
      return Seq.empty
    val nChunks = chunkOffs.length
    val perChunk = new Array[Int](nChunks)
    var entryIdx = 0
    var c = 1
    while (c <= nChunks) {
      while (entryIdx + 1 < stscEntries.length && stscEntries(entryIdx + 1)._1 <= c)
        entryIdx += 1
      perChunk(c - 1) = stscEntries(entryIdx)._2
      c += 1
    }
    if (perChunk.map(_.toLong).sum != sizes.length) return Seq.empty

    // per-sample absolute offsets: chunk offset + sizes of preceding
    // in-chunk samples
    val out = IndexedSeq.newBuilder[Mp4Sample]
    var sIdx = 0
    var ch = 0
    while (ch < nChunks) {
      var within = 0L
      var k = 0
      while (k < perChunk(ch)) {
        out += Mp4Sample(mediaId, sIdx, ch, sizes(sIdx),
          chunkOffs(ch) + within, durations(sIdx))
        within += sizes(sIdx)
        sIdx += 1; k += 1
      }
      ch += 1
    }
    out.result()
  }

  // ------------------------------------------------------------- synthesis (ingest stand-in)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  /** Sample-size formula shared with the oracle: closed-form per (seed, i). */
  def sampleSize(seed: Long, i: Int): Int =
    100 + java.lang.Math.floorMod(seed * 17 + i.toLong * 13, 64L).toInt
  /** Duration formula: runs of 4 equal deltas, so stts run-length encoding
    * is exercised with runs > 1. */
  def sampleDuration(i: Int): Int = 900 + (i / 4) * 10
  /** Samples per synthesized container: 16–32, seed-dependent. */
  def sampleCount(seed: Long): Int = 16 + java.lang.Math.floorMod(seed, 17L).toInt

  private val ChunkSize = 4

  /** Deterministic minimal-but-valid MP4: `ftyp` + `mdat` (zero payload of
    * the true total size) + `moov` with a full
    * `trak/mdia/minf/stbl` chain — real big-endian box structure through
    * the same byte layout a camera writes, so [[parseSampleTable]] is
    * exercised against genuine structure (including boxes it must SKIP:
    * mvhd, tkhd, mdhd, hdlr, vmhd, stsd). Samples are chunked 4-at-a-time
    * with contiguous layout, so chunk offsets are data_start + prefix
    * sums — closed-form for the oracle. */
  def synthMp4(seed: Long): Array[Byte] = {
    val n = sampleCount(seed)
    val sizes = (0 until n).map(sampleSize(seed, _))
    val nChunks = (n + ChunkSize - 1) / ChunkSize
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200L), "isomiso2".getBytes)
    val dataStart = ftyp.length + 8L // mdat header follows ftyp
    val mdat = box("mdat", new Array[Byte](sizes.sum))
    // stts run-length: consecutive equal deltas collapse
    val sttsRuns = {
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      (0 until n).foreach { i =>
        val d = sampleDuration(i)
        if (runs.nonEmpty && runs.last._2 == d)
          runs(runs.length - 1) = (runs.last._1 + 1, d)
        else runs += ((1, d))
      }
      runs.toSeq
    }
    val stts = box("stts", be32(0), be32(sttsRuns.length),
      sttsRuns.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)
    val stscEntries = // chunks of 4; a short last chunk needs its own entry
      if (n % ChunkSize == 0 || n < ChunkSize) Seq((1, math.min(n, ChunkSize)))
      else Seq((1, ChunkSize), (nChunks, n % ChunkSize))
    val stsc = box("stsc", be32(0), be32(stscEntries.length),
      stscEntries.flatMap { case (f, s) => be32(f) ++ be32(s) ++ be32(1) }.toArray)
    val stsz = box("stsz", be32(0), be32(0), be32(n),
      sizes.flatMap(s => be32(s)).toArray)
    val chunkOffs = (0 until nChunks).map { c =>
      dataStart + sizes.take(c * ChunkSize).map(_.toLong).sum
    }
    val stco = box("stco", be32(0), be32(nChunks),
      chunkOffs.flatMap(be32).toArray)
    val stsd = box("stsd", be32(0), be32(0)) // zero entries; parser skips it
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = box("vmhd", new Array[Byte](12))
    val minf = box("minf", vmhd, stbl)
    val mdhd = box("mdhd", new Array[Byte](24))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes, new Array[Byte](13))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = box("tkhd", new Array[Byte](84))
    val trak = box("trak", tkhd, mdia)
    val mvhd = box("mvhd", new Array[Byte](100))
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  // ------------------------------------------------------------- q202: container index through the gate
  /** REAL MP4 box-structure parse through the DuckDB gate: per document,
    * synthesize the deterministic container ([[synthMp4]], seed = doc_id),
    * walk its boxes back with [[parseSampleTable]], and emit exact integer
    * aggregates over the recovered sample table. The oracle reproduces
    * every statistic in closed form from the size/duration formulas plus
    * prefix sums for offsets — so a parser that mis-walked the box tree,
    * mis-read an offset table, mis-expanded stsc chunking (off_sum/last_off
    * shift) or stts run-lengths (dur_posw shifts), or returned samples out
    * of order (sz_posw) hash-mismatches. Map-only like q194/q195: synth,
    * parse and the per-media aggregate run partition-local with one
    * container held at a time. */
  def q202Mp4Index(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap(id => parseSampleTable(id, synthMp4(id)))
      }
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_samples"),
        (max(col("chunk_idx")) + 1).cast("long").as("n_chunks"),
        sum(col("size")).as("bytes_total"),
        sum(col("size") * col("sample_idx")).as("sz_posw"),
        sum(col("offset")).as("off_sum"),
        max(col("offset")).as("last_off"),
        sum(col("duration")).as("dur_total"),
        sum(col("duration") * col("sample_idx")).as("dur_posw"))
      .orderBy(col("media_id"))
  }

  val q202Sql: String =
    """WITH m AS (SELECT doc_id AS media_id, 16 + doc_id % 17 AS n FROM documents),
      |s AS (SELECT media_id, n, g.i AS i,
      |             100 + (media_id * 17 + g.i * 13) % 64 AS sz,
      |             900 + (g.i // 4) * 10 AS dur
      |      FROM m, generate_series(0, 32) AS g(i) WHERE g.i < n),
      |o AS (SELECT media_id, n, i, sz, dur,
      |             32 + coalesce(sum(sz) OVER (PARTITION BY media_id ORDER BY i
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |      FROM s)
      |SELECT media_id, count(*)::BIGINT AS n_samples,
      |  ((max(n) + 3) // 4)::BIGINT AS n_chunks,
      |  sum(sz)::BIGINT AS bytes_total, sum(sz * i)::BIGINT AS sz_posw,
      |  sum(off)::BIGINT AS off_sum, max(off)::BIGINT AS last_off,
      |  sum(dur)::BIGINT AS dur_total, sum(dur * i)::BIGINT AS dur_posw
      |FROM o GROUP BY media_id ORDER BY media_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q202_mp4_index", q202Mp4Index _, Some(q202Sql)),
  )
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pure-byte Matroska/WebM (EBML) container indexing — the second real
  * container format next to [[Mp4]], with a genuinely different binary
  * grammar: EBML elements are `[VINT id][VINT size][payload]` with
  * variable-length integers (leading-zero-count width encoding), vs ISO
  * BMFF's fixed big-endian boxes. Walking `Segment → Cluster →
  * (Timestamp, SimpleBlock)` yields every frame's exact byte offset,
  * payload size, track and absolute timestamp — the seek table a frame
  * sampler needs, no codec involved.
  *
  * Same scale contract as [[Mp4]]: partition-local, one payload held at a
  * time, parser state is element-header-sized; the per-media aggregate is
  * map-side combined. Handled beyond the synthetic shape: unknown-size
  * Segments/Clusters (the streamed-WebM form — a Cluster ends at its next
  * sibling), all three lacing modes (Xiph/EBML/fixed) expanded to exact
  * per-frame sizes and offsets, and BlockGroup-wrapped Blocks with
  * BlockDuration (the form real MKV uses for B-frames/duration-carrying
  * streams) alongside SimpleBlocks; unknown elements are skipped by the
  * generic walk.
  */
object Mkv {

  /** One indexed frame from a SimpleBlock or a BlockGroup-wrapped Block;
    * `dur_ms` is the BlockDuration when the frame came from a BlockGroup
    * carrying one, −1 otherwise (SimpleBlocks encode no duration). */
  final case class MkvBlock(media_id: Long, block_idx: Int, cluster_idx: Int,
                            track: Int, ts_ms: Int, size: Int, offset: Long,
                            dur_ms: Int = -1)

  // EBML element ids (marker bits included, as they appear on the wire)
  private val SegmentId = 0x18538067L
  private val ClusterId = 0x1F43B675L
  private val ClusterTsId = 0xE7L
  private val SimpleBlockId = 0xA3L
  private val BlockGroupId = 0xA0L
  private val BlockId = 0xA1L
  private val BlockDurationId = 0x9BL

  /** VINT width from the first byte: 1 + leading zeros (0 → invalid). */
  private def vintLen(b0: Int): Int =
    if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23

  /** Read one size/track VINT at `o` (marker stripped): (value, length);
    * an ALL-ONES data payload is the EBML "unknown size" reservation,
    * returned as -1. None on truncation/invalid width. */
  private def readVint(b: Array[Byte], o: Int, end: Int): Option[(Long, Int)] = {
    if (o >= end) return None
    val s0 = b(o) & 0xff
    val sl = vintLen(s0)
    if (sl < 1 || sl > 8 || o + sl > end) return None
    var v = (s0 & (0xff >>> sl)).toLong
    var k = 1
    while (k < sl) { v = (v << 8) | (b(o + k) & 0xff); k += 1 }
    val allOnes = if (sl == 8) 0xffffffffffffffL /* 56 data bits */
                  else (1L << (7 * sl)) - 1
    Some((if (v == allOnes) -1L else v, sl))
  }

  /** Element id (with marker) at `o`, without consuming — for ending an
    * unknown-size Cluster at the next sibling Cluster. */
  private def peekId(b: Array[Byte], o: Int, end: Int): Option[Long] = {
    if (o >= end) return None
    val il = vintLen(b(o) & 0xff)
    if (il < 1 || il > 4 || o + il > end) return None
    var id = 0L
    var k = 0
    while (k < il) { id = (id << 8) | (b(o + k) & 0xff); k += 1 }
    Some(id)
  }

  /** Parse one element header at `o`: (id with marker, dataStart,
    * dataEnd, unknownSize). Streamed Matroska/WebM writes Segment (and
    * sometimes Cluster) with the reserved all-ones "unknown size" VINT —
    * mapped to extends-to-`end` here, with the Cluster walk additionally
    * ending an unknown-size Cluster at the next Cluster sibling. None on
    * truncation/malformed width — callers end their walk, so a corrupt
    * blob degrades to the empty index instead of throwing. */
  private def element(b: Array[Byte], o: Int, end: Int): Option[(Long, Int, Int, Boolean)] = {
    peekId(b, o, end) match {
      case None => None
      case Some(id) =>
        val il = vintLen(b(o) & 0xff)
        readVint(b, o + il, end) match {
          case None => None
          case Some((sz0, sl)) =>
            val ds = o + il + sl
            val unknown = sz0 < 0L
            val sz = if (unknown) (end - ds).toLong else sz0
            if (sz < 0 || ds + sz > end) None
            else Some((id, ds, (ds + sz).toInt, unknown))
        }
    }
  }

  /** Unsigned big-endian integer payload (EBML uint). */
  private def uintAt(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L; var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** Per-frame sizes of one SimpleBlock payload after the flags byte:
    * handles all three lacing modes (Xiph 255-run sizes, EBML vint +
    * signed-vint deltas, fixed equal split) plus the unlaced case —
    * returns (frame sizes, first frame's offset within [p, be)), or None
    * on malformed lace data. */
  private def laceSizes(b: Array[Byte], flags: Int, p0: Int, be: Int): Option[(Seq[Int], Int)] = {
    val mode = (flags >> 1) & 0x3 // 0 none, 1 Xiph, 2 fixed, 3 EBML
    if (mode == 0) return Some((Seq(be - p0), p0))
    if (p0 >= be) return None
    val total = (b(p0) & 0xff) + 1 // lace count - 1 on the wire
    var p = p0 + 1
    // a laced block with ONE frame stores count-1 = 0 size entries in
    // EVERY mode — short-circuit before the per-mode header reads (the
    // EBML branch would otherwise consume a first-size VINT that the
    // spec says is absent, mis-sizing a legal single-frame block)
    if (total == 1) return if (be - p < 0) None else Some((Seq(be - p), p))
    mode match {
      case 2 => // fixed: remaining bytes split equally
        val rem = be - p
        if (rem < 0 || rem % total != 0) None
        else Some((Seq.fill(total)(rem / total), p))
      case 1 => // Xiph: 255-run byte sums for all but the last frame
        val szs = new Array[Int](total)
        var i = 0
        while (i < total - 1) {
          var s = 0
          var more = true
          while (more) {
            if (p >= be) return None
            val v = b(p) & 0xff; p += 1; s += v; more = v == 255
          }
          szs(i) = s; i += 1
        }
        val last = be - p - szs.take(total - 1).sum
        if (last < 0) None else { szs(total - 1) = last; Some((szs.toSeq, p)) }
      case _ => // EBML: first size a vint, then signed-vint deltas
        readVint(b, p, be) match {
          case None => None
          case Some((first, fl)) =>
            if (first < 0) return None
            p += fl
            val szs = new Array[Int](total)
            szs(0) = first.toInt
            var i = 1
            while (i < total - 1) {
              readVint(b, p, be) match {
                case None => return None
                case Some((raw, l)) =>
                  // signed vint: raw − (2^(7·len−1) − 1)
                  val delta = raw - ((1L << (7 * l - 1)) - 1)
                  val sz = szs(i - 1) + delta
                  if (sz < 0 || sz > be - p) return None
                  szs(i) = sz.toInt; p += l; i += 1
              }
            }
            val last = be - p - szs.take(total - 1).sum
            if (last < 0) None else { szs(total - 1) = last; Some((szs.toSeq, p)) }
        }
    }
  }

  /** Parse one (Simple)Block body `[track VINT][s16 rel ts][flags][lace…]`
    * in [bs, be): appends one row per frame starting at `blockIdx0`,
    * returns the next block index, or None on malformed data (the caller
    * surfaces the partial index built so far). Block and SimpleBlock share
    * this exact wire layout — only flag SEMANTICS differ (keyframe/
    * discardable vs reserved), and the lacing bits are common to both. */
  private def emitFrames(b: Array[Byte], bs: Int, be: Int, mediaId: Long,
                         clusterIdx: Int, clusterTs: Long, durMs: Int,
                         blockIdx0: Int,
                         out: scala.collection.mutable.Builder[MkvBlock, Seq[MkvBlock]]): Option[Int] = {
    // a zero-size block puts bs == be, so bound BEFORE reading the track
    // byte (degrade, never throw)
    if (bs >= be) return None
    val tl = vintLen(b(bs) & 0xff)
    if (tl < 1 || bs + tl + 3 > be) return None
    val track = (uintAt(b, bs, bs + tl) &
      ((1L << (7 * tl)) - 1)).toInt // strip the VINT marker bit
    val rel = ((b(bs + tl) << 8) | (b(bs + tl + 1) & 0xff)).toShort.toInt
    val flags = b(bs + tl + 2) & 0xff
    laceSizes(b, flags, bs + tl + 3, be) match {
      case None => None
      case Some((sizes, firstOff)) =>
        var off = firstOff.toLong
        var idx = blockIdx0
        sizes.foreach { sz =>
          out += MkvBlock(mediaId, idx, clusterIdx, track,
            (clusterTs + rel).toInt, sz, off, durMs)
          idx += 1
          off += sz
        }
        Some(idx)
    }
  }

  /** Index every block FRAME — SimpleBlocks AND BlockGroup-wrapped Blocks
    * (the form real MKV uses for B-frames/duration-carrying streams):
    * exact track, absolute timestamp (cluster timestamp + signed 16-bit
    * relative), payload size, absolute byte offset, and the BlockDuration
    * when the wrapping BlockGroup declares one — laced blocks
    * (Xiph/EBML/fixed) expand to one row per frame with exact per-frame
    * sizes/offsets in both forms. Empty on malformed input; a partial
    * index on mid-file corruption. */
  def parseBlocks(mediaId: Long, payload: Array[Byte]): Seq[MkvBlock] = {
    val out = Seq.newBuilder[MkvBlock]
    var blockIdx = 0
    var clusterIdx = -1
    // top level: skip the EBML header (and anything else) until Segment
    var o = 0
    var segment: Option[(Int, Int)] = None
    while (segment.isEmpty) {
      element(payload, o, payload.length) match {
        case Some((SegmentId, ds, de, _)) => segment = Some((ds, de))
        case Some((_, _, de, _)) => o = de
        case None => return Seq.empty
      }
    }
    val (ss, se) = segment.get
    var so = ss
    while (so < se) {
      element(payload, so, se) match {
        case Some((ClusterId, cs, ce, unk)) =>
          clusterIdx += 1
          var clusterTs = 0L
          var co = cs
          var clusterOpen = true
          while (clusterOpen && co < ce) {
            // an unknown-size Cluster ends at the next Cluster sibling
            if (unk && peekId(payload, co, ce).contains(ClusterId)) {
              clusterOpen = false
            } else element(payload, co, ce) match {
              case Some((ClusterTsId, ts, te, _)) =>
                clusterTs = uintAt(payload, ts, te); co = te
              case Some((SimpleBlockId, bs, be, _)) =>
                emitFrames(payload, bs, be, mediaId, clusterIdx, clusterTs,
                  -1, blockIdx, out) match {
                  case None => return out.result()
                  case Some(next) => blockIdx = next
                }
                co = be
              case Some((BlockGroupId, gs, ge, _)) =>
                // children in any order: the Block plus optional
                // BlockDuration (read BEFORE emitting so a duration that
                // follows its Block still attaches). A malformed child
                // ends the group walk but the group's extent is known, so
                // the cluster walk continues past it — one corrupt group
                // degrades to its own loss, not the whole cluster's.
                var go = gs
                var blk: Option[(Int, Int)] = None
                var dur = -1
                var groupOk = true
                while (groupOk && go < ge) {
                  element(payload, go, ge) match {
                    case Some((BlockId, s2, e2, _)) =>
                      if (blk.isEmpty) blk = Some((s2, e2)); go = e2
                    case Some((BlockDurationId, s2, e2, _)) =>
                      dur = uintAt(payload, s2, e2).toInt; go = e2
                    case Some((_, _, de, _)) => go = de
                    case None => groupOk = false
                  }
                }
                blk.foreach { case (bs, be) =>
                  emitFrames(payload, bs, be, mediaId, clusterIdx, clusterTs,
                    dur, blockIdx, out) match {
                    case None => return out.result()
                    case Some(next) => blockIdx = next
                  }
                }
                co = ge
              case Some((_, _, de, _)) => co = de
              case None => return out.result()
            }
          }
          so = if (unk && !clusterOpen) co else ce
        case Some((_, _, de, _)) => so = de
        case None => return out.result()
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- synthesis (ingest stand-in)
  /** Frame-size formula shared with the oracle. */
  def blockSize(seed: Long, c: Int, b: Int): Int =
    60 + java.lang.Math.floorMod(seed * 23 + c.toLong * 31 + b.toLong * 17, 48L).toInt
  /** Clusters per container: 3–6, seed-dependent; 5 blocks per cluster. */
  def clusterCount(seed: Long): Int = 3 + java.lang.Math.floorMod(seed, 4L).toInt
  val BlocksPerCluster = 5

  private def be(v: Long, n: Int): Array[Byte] =
    (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
  /** 2-byte VINT size (0x40xx form) — fixed width so offsets stay
    * closed-form for the oracle; the parser handles any width. */
  private def vint2(v: Int): Array[Byte] = {
    require(v <= 0x3ffe); Array((0x40 | (v >> 8)).toByte, (v & 0xff).toByte)
  }

  /** Deterministic minimal-but-valid Matroska file: EBML header, Segment
    * with Info (TimestampScale) and Tracks (one TrackEntry) the parser
    * must SKIP, then `clusterCount` Clusters of 5 SimpleBlocks each.
    * Layout constants (16-byte EBML header, 12-byte Segment header,
    * 13-byte Info, 10-byte Tracks ⇒ clusters start at 51; 10 bytes of
    * per-cluster overhead, 7 bytes of per-block header) give the oracle
    * closed-form offsets: off(i) = 68 + 10·cluster + 7·i + Σ_{j<i} size_j. */
  def synthMkv(seed: Long): Array[Byte] = {
    val nC = clusterCount(seed)
    val ebml = {
      val docType = Array(0x42.toByte, 0x82.toByte, 0x88.toByte) ++ "matroska".getBytes
      be(0x1A45DFA3L, 4) ++ Array((0x80 | docType.length).toByte) ++ docType
    }
    val info = be(0x1549A966L, 4) ++ Array(0x88.toByte) ++
      (be(0x2AD7B1L, 3) ++ Array(0x84.toByte) ++ be(1000000L, 4))
    val tracks = be(0x1654AE6BL, 4) ++ Array(0x85.toByte) ++
      (Array(0xAE.toByte, 0x83.toByte) ++ Array(0xD7.toByte, 0x81.toByte, 0x81.toByte))
    val clusters = (0 until nC).flatMap { c =>
      val tsEl = Array(0xE7.toByte, 0x82.toByte) ++ be(c * 1000L, 2)
      val blocks = (0 until BlocksPerCluster).flatMap { b =>
        val sz = blockSize(seed, c, b)
        Array(0xA3.toByte) ++ vint2(4 + sz) ++
          Array(0x81.toByte) ++ be(b * 40L, 2) ++ Array(0x80.toByte) ++
          new Array[Byte](sz)
      }
      val content = tsEl ++ blocks
      be(ClusterId, 4) ++ vint2(content.length) ++ content
    }
    val segContent = info ++ tracks ++ clusters
    // 8-byte size VINT (0x01 + 7 value bytes) keeps the Segment header at
    // a fixed 12 bytes whatever the content length
    val segment = be(SegmentId, 4) ++
      (Array(0x01.toByte) ++ be(segContent.length.toLong, 7)) ++ segContent
    ebml ++ segment
  }

  /** Block duration formula shared with the q206 oracle (1-byte range). */
  def blockDur(seed: Long, c: Int, b: Int): Int =
    30 + java.lang.Math.floorMod(seed * 11 + c.toLong * 7 + b.toLong * 3, 20L).toInt

  /** Deterministic Matroska file in the BLOCKGROUP form: identical
    * header/Info/Tracks layout to [[synthMkv]] (clusters start at 51),
    * but every frame rides as `BlockGroup(Block, BlockDuration)` — the
    * wrapping real muxers emit for B-frame/duration-carrying streams,
    * with the BlockDuration AFTER its Block (the common order, which the
    * parser must attach retroactively). Per-block overhead is 13 bytes
    * (3 group hdr + 3 block hdr + 4 body hdr + 3 duration el), so
    * off(i) = 71 + 10·cluster + 13·i + Σ_{j<i} size_j stays closed-form
    * for the oracle. */
  def synthMkvGrouped(seed: Long): Array[Byte] = {
    val nC = clusterCount(seed)
    val ebml = {
      val docType = Array(0x42.toByte, 0x82.toByte, 0x88.toByte) ++ "matroska".getBytes
      be(0x1A45DFA3L, 4) ++ Array((0x80 | docType.length).toByte) ++ docType
    }
    val info = be(0x1549A966L, 4) ++ Array(0x88.toByte) ++
      (be(0x2AD7B1L, 3) ++ Array(0x84.toByte) ++ be(1000000L, 4))
    val tracks = be(0x1654AE6BL, 4) ++ Array(0x85.toByte) ++
      (Array(0xAE.toByte, 0x83.toByte) ++ Array(0xD7.toByte, 0x81.toByte, 0x81.toByte))
    val clusters = (0 until nC).flatMap { c =>
      val tsEl = Array(0xE7.toByte, 0x82.toByte) ++ be(c * 1000L, 2)
      val groups = (0 until BlocksPerCluster).flatMap { b =>
        val sz = blockSize(seed, c, b)
        val blockEl = Array(0xA1.toByte) ++ vint2(4 + sz) ++
          Array(0x81.toByte) ++ be(b * 40L, 2) ++ Array(0x00.toByte) ++
          new Array[Byte](sz)
        val durEl = Array(0x9B.toByte, 0x81.toByte, blockDur(seed, c, b).toByte)
        val body = blockEl ++ durEl
        Array(0xA0.toByte) ++ vint2(body.length) ++ body
      }
      val content = tsEl ++ groups
      be(ClusterId, 4) ++ vint2(content.length) ++ content
    }
    val segContent = info ++ tracks ++ clusters
    val segment = be(SegmentId, 4) ++
      (Array(0x01.toByte) ++ be(segContent.length.toLong, 7)) ++ segContent
    ebml ++ segment
  }

  // ------------------------------------------------------------- q203: EBML index through the gate
  /** REAL EBML walk through the DuckDB gate, the Matroska twin of
    * [[Mp4.q202Mp4Index]]: per document synthesize the deterministic
    * container (seed = doc_id), parse it back with [[parseBlocks]], and
    * emit exact integer aggregates. The oracle reproduces everything in
    * closed form — VINT mis-decoding shifts every offset (off_sum,
    * last_off), timestamp mis-assembly (cluster base + signed relative)
    * breaks ts_sum, skipping Info/Tracks wrongly breaks the first
    * cluster's offsets, and block-order mistakes break sz_posw. */
  def q203MkvIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap(id => parseBlocks(id, synthMkv(id)))
      }
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_blocks"),
        (max(col("cluster_idx")) + 1).cast("long").as("n_clusters"),
        sum(col("size")).as("bytes_total"),
        sum(col("size") * col("block_idx")).as("sz_posw"),
        sum(col("offset")).as("off_sum"),
        max(col("offset")).as("last_off"),
        sum(col("ts_ms")).as("ts_sum"))
      .orderBy(col("media_id"))
  }

  val q203Sql: String =
    """WITH m AS (SELECT doc_id AS media_id, (3 + doc_id % 4) * 5 AS nb FROM documents),
      |s AS (SELECT media_id, nb, g.i AS i, g.i // 5 AS c, g.i % 5 AS b
      |      FROM m, generate_series(0, 29) AS g(i) WHERE g.i < nb),
      |z AS (SELECT media_id, i, c, b,
      |             60 + (media_id * 23 + c * 31 + b * 17) % 48 AS sz,
      |             c * 1000 + b * 40 AS ts
      |      FROM s),
      |o AS (SELECT media_id, i, c, sz, ts,
      |             68 + 10 * c + 7 * i + coalesce(sum(sz) OVER (
      |               PARTITION BY media_id ORDER BY i
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |      FROM z)
      |SELECT media_id, count(*)::BIGINT AS n_blocks,
      |  (max(c) + 1)::BIGINT AS n_clusters,
      |  sum(sz)::BIGINT AS bytes_total, sum(sz * i)::BIGINT AS sz_posw,
      |  sum(off)::BIGINT AS off_sum, max(off)::BIGINT AS last_off,
      |  sum(ts)::BIGINT AS ts_sum
      |FROM o GROUP BY media_id ORDER BY media_id""".stripMargin

  // ------------------------------------------------------------- q206: BlockGroup index through the gate
  /** REAL BlockGroup/Block(+BlockDuration) walk through the DuckDB gate —
    * the grouped twin of [[q203MkvIndex]]: per document synthesize the
    * BlockGroup-form container ([[synthMkvGrouped]], seed = doc_id), parse
    * it back with [[parseBlocks]], and emit exact integer aggregates. The
    * oracle reproduces everything in closed form; beyond q203's checks it
    * pins the GROUP semantics — dur_sum/dur_posw break if BlockDurations
    * fail to attach to their Blocks (or attach to the wrong one), and the
    * 13-byte per-group overhead in the offset formula breaks off_sum if
    * the walker mis-sizes the group envelope. Map-only like q202/q203. */
  def q206MkvBlockgroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap(id => parseBlocks(id, synthMkvGrouped(id)))
      }
      .toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_blocks"),
        (max(col("cluster_idx")) + 1).cast("long").as("n_clusters"),
        sum(col("size")).as("bytes_total"),
        sum(col("offset")).as("off_sum"),
        max(col("offset")).as("last_off"),
        sum(col("ts_ms")).as("ts_sum"),
        sum(col("dur_ms")).as("dur_sum"),
        sum(col("dur_ms") * col("block_idx")).as("dur_posw"))
      .orderBy(col("media_id"))
  }

  val q206Sql: String =
    """WITH m AS (SELECT doc_id AS media_id, (3 + doc_id % 4) * 5 AS nb FROM documents),
      |s AS (SELECT media_id, nb, g.i AS i, g.i // 5 AS c, g.i % 5 AS b
      |      FROM m, generate_series(0, 29) AS g(i) WHERE g.i < nb),
      |z AS (SELECT media_id, i, c, b,
      |             60 + (media_id * 23 + c * 31 + b * 17) % 48 AS sz,
      |             c * 1000 + b * 40 AS ts,
      |             30 + (media_id * 11 + c * 7 + b * 3) % 20 AS dur
      |      FROM s),
      |o AS (SELECT media_id, i, c, sz, ts, dur,
      |             71 + 10 * c + 13 * i + coalesce(sum(sz) OVER (
      |               PARTITION BY media_id ORDER BY i
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |      FROM z)
      |SELECT media_id, count(*)::BIGINT AS n_blocks,
      |  (max(c) + 1)::BIGINT AS n_clusters,
      |  sum(sz)::BIGINT AS bytes_total,
      |  sum(off)::BIGINT AS off_sum, max(off)::BIGINT AS last_off,
      |  sum(ts)::BIGINT AS ts_sum, sum(dur)::BIGINT AS dur_sum,
      |  sum(dur * i)::BIGINT AS dur_posw
      |FROM o GROUP BY media_id ORDER BY media_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q203_mkv_index", q203MkvIndex _, Some(q203Sql)),
    ("q206_mkv_blockgroup", q206MkvBlockgroup _, Some(q206Sql)),
  )
}

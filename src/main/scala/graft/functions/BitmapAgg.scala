package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Bitmap aggregate family (ClickHouse `groupBitmapState` /
  * `bitmap*Cardinality`): per-group membership as a CHUNKED SPARSE
  * bitmap over the full non-negative 64-bit id domain, mergeable by OR,
  * serialized canonically — so set algebra downstream (AND/OR
  * cardinality, Jaccard) is pure word arithmetic on two blobs instead
  * of a row-level join.
  *
  * Container layout (the Roaring idea, minimal form): ids partition by
  * their high 48 bits into 64Ki-wide chunks; each POPULATED chunk is a
  * dense 8 KiB bitset over the low 16 bits. Memory is
  * O(populated chunks), never O(domain width) — the round-8 lesson: a
  * dense array over the domain was fine for compact synthetic ids but
  * allocated domain/8 bytes per GROUP the moment 64-bit entity ids
  * appeared (replica ids at k·10⁹ → 375 MB/group → OOM; real 100 TB
  * corpora use snowflake-style ids that are ALWAYS like this). Dense
  * sub-containers keep the hot loop branch-free; clustered id spaces
  * (the common case) populate few chunks densely.
  *
  * Contrast with the relational formulation (q127: the deduped
  * membership table IS the bitmap, partitioned by user): the aggregate
  * materializes each group's set ONCE; every pairwise overlap after
  * that costs a chunk-aligned byte-AND of two buffers, not a shuffle.
  * With P pairwise questions over the same groups, the relational join
  * re-shuffles membership once per formulation, while bitmaps answer
  * all P from |groups| blobs. ClickHouse ships this as a first-class
  * state type for exactly that reason (segment-overlap dashboards).
  *
  * Serialized form (canonical: equal sets ⇒ identical bytes): chunks
  * ascending by key, each as [key: 8B BE][len: 4B BE][len bytes,
  * trailing zeros trimmed]. The scalar algebra walks two blobs with a
  * two-pointer merge on the sorted keys.
  *
  * Exactness: a bit is set iff the value occurred; OR is commutative,
  * associative, idempotent — merge order and partial-aggregation split
  * points cannot change the final bitmap, so cardinalities gate against
  * a DuckDB count-distinct oracle exactly (unlike HLL's q39).
  */
object BitmapAgg {

  private val ChunkBytes = 8192 // 64Ki bits: low 16 bits of the id

  /** Partial state: populated chunk bitsets by high-48-bit key.
    * java.util.HashMap for dependable kryo round-trips. */
  final case class Buf(m: java.util.HashMap[java.lang.Long, Array[Byte]])

  class BitmapStateAgg extends Aggregator[Long, Buf, Array[Byte]] {
    override def zero: Buf = Buf(new java.util.HashMap)

    override def reduce(b: Buf, v: Long): Buf = {
      require(v >= 0, s"bitmap_state domain is non-negative longs, got $v")
      val key = java.lang.Long.valueOf(v >>> 16)
      var chunk = b.m.get(key)
      if (chunk == null) { chunk = new Array[Byte](ChunkBytes); b.m.put(key, chunk) }
      val low = (v & 0xffffL).toInt
      chunk(low >>> 3) = (chunk(low >>> 3) | (1 << (low & 7))).toByte
      b
    }

    // Merges INTO the larger of the two buffers (possibly y — safe
    // because Spark kryo-deserializes a fresh buffer per merged partial;
    // the chunk CLONE below keeps that the only assumption: no adopted
    // array is ever shared between two live buffers).
    override def merge(x: Buf, y: Buf): Buf = {
      val (big, small) = if (x.m.size >= y.m.size) (x, y) else (y, x)
      small.m.forEach { (k, sc) =>
        val bc = big.m.get(k)
        if (bc == null) big.m.put(k, java.util.Arrays.copyOf(sc, ChunkBytes))
        else {
          var i = 0
          while (i < ChunkBytes) { bc(i) = (bc(i) | sc(i)).toByte; i += 1 }
        }
      }
      big
    }

    // canonical form: keys ascending, trailing zero bytes trimmed per
    // chunk, so equal sets have byte-identical states regardless of
    // growth/merge history
    override def finish(b: Buf): Array[Byte] = {
      val keys = new Array[Long](b.m.size)
      var n = 0
      val it = b.m.keySet().iterator()
      while (it.hasNext) { keys(n) = it.next(); n += 1 }
      java.util.Arrays.sort(keys)
      val bos = new java.io.ByteArrayOutputStream(64 + n * 64)
      val out = new java.io.DataOutputStream(bos)
      var i = 0
      while (i < n) {
        val chunk = b.m.get(keys(i))
        var len = ChunkBytes
        while (len > 0 && chunk(len - 1) == 0) len -= 1
        if (len > 0) { // an all-zero chunk cannot occur, but stay canonical
          out.writeLong(keys(i))
          out.writeInt(len)
          out.write(chunk, 0, len)
        }
        i += 1
      }
      bos.toByteArray
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `bitmap_state(col)` aggregate column: serialized membership bitmap. */
  def bitmap_state(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new BitmapStateAgg, Encoders.scalaLong)(c)

  // ---- serialized-blob walkers (driver/group-cardinality rows only) ----

  /** Cursor over the canonical serialized form. */
  private final class Cur(val a: Array[Byte]) {
    var pos = 0
    var key = 0L
    var len = 0
    var off = 0 // chunk bytes start
    def hasNext: Boolean = pos < a.length
    def advance(): Unit = { // load the chunk header at pos
      val bb = java.nio.ByteBuffer.wrap(a, pos, 12)
      key = bb.getLong; len = bb.getInt; off = pos + 12; pos = off + len
    }
  }

  private def popcountRange(a: Array[Byte], off: Int, len: Int): Long = {
    var n = 0L; var i = 0
    while (i < len) { n += java.lang.Integer.bitCount(a(off + i) & 0xff); i += 1 }
    n
  }

  private def popcountAll(a: Array[Byte]): Long = {
    var n = 0L
    val c = new Cur(a)
    while (c.hasNext) { c.advance(); n += popcountRange(a, c.off, c.len) }
    n
  }

  // The scalar algebra runs on GROUP-cardinality rows (|groups| blobs,
  // |groups|² pairs), never on the corpus — a Scala UDF is fine here; the
  // corpus-sized work is all inside the aggregate above.
  val bitmap_cardinality = udf((a: Array[Byte]) => popcountAll(a))

  val bitmap_and_cardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    var n = 0L
    val ca = new Cur(a); val cb = new Cur(b)
    var haveA = ca.hasNext; if (haveA) ca.advance()
    var haveB = cb.hasNext; if (haveB) cb.advance()
    while (haveA && haveB) {
      if (ca.key < cb.key) { haveA = ca.hasNext; if (haveA) ca.advance() }
      else if (cb.key < ca.key) { haveB = cb.hasNext; if (haveB) cb.advance() }
      else {
        val len = math.min(ca.len, cb.len)
        var i = 0
        while (i < len) {
          n += java.lang.Integer.bitCount(a(ca.off + i) & b(cb.off + i) & 0xff); i += 1
        }
        haveA = ca.hasNext; if (haveA) ca.advance()
        haveB = cb.hasNext; if (haveB) cb.advance()
      }
    }
    n
  })

  val bitmap_or_cardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    // |A ∪ B| = |A| + |B| − |A ∩ B|, all three linear walks of the blobs
    var inter = 0L
    val ca = new Cur(a); val cb = new Cur(b)
    var haveA = ca.hasNext; if (haveA) ca.advance()
    var haveB = cb.hasNext; if (haveB) cb.advance()
    while (haveA && haveB) {
      if (ca.key < cb.key) { haveA = ca.hasNext; if (haveA) ca.advance() }
      else if (cb.key < ca.key) { haveB = cb.hasNext; if (haveB) cb.advance() }
      else {
        val len = math.min(ca.len, cb.len)
        var i = 0
        while (i < len) {
          inter += java.lang.Integer.bitCount(a(ca.off + i) & b(cb.off + i) & 0xff); i += 1
        }
        haveA = ca.hasNext; if (haveA) ca.advance()
        haveB = cb.hasNext; if (haveB) cb.advance()
      }
    }
    popcountAll(a) + popcountAll(b) - inter
  })
}

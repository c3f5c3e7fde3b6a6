package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Bitmap aggregate family (ClickHouse `groupBitmapState` /
  * `bitmap*Cardinality`): per-group membership as a dense word-aligned
  * bitmap over a bounded non-negative integer domain, mergeable by OR,
  * serialized as the raw byte array — so set algebra downstream
  * (AND/OR cardinality, Jaccard) is pure word arithmetic on two blobs
  * instead of a row-level join.
  *
  * Contrast with the relational formulation (q127: the deduped membership
  * table IS the bitmap, partitioned by user): the aggregate materializes
  * each group's set ONCE into O(domain/8) bytes; every pairwise overlap
  * after that costs a byte-AND of two buffers, not a shuffle. The
  * crossover is pair count — with P pairwise questions over the same
  * groups, the relational join re-shuffles membership once, while bitmaps
  * answer all P from |groups| blobs. ClickHouse ships this as a first-
  * class state type for exactly that reason (segment-overlap dashboards).
  *
  * State bound: domain/8 bytes per partial buffer (1500 users → 188 B;
  * 10M users → 1.25 MB — still one buffer per group per partition, far
  * under executor memory at 32 groups). The 100 TB swap for SPARSE
  * domains (64-bit ids) is Roaring containers — same algebra, same
  * merge-by-OR contract; dense words are the right container here
  * because the synthetic user domain is compact.
  *
  * Exactness: a bit is set iff the value occurred; OR is commutative,
  * associative, idempotent — merge order and partial-aggregation split
  * points cannot change the final bitmap, so cardinalities gate against
  * a DuckDB count-distinct oracle exactly (unlike HLL's q39).
  */
object BitmapAgg {

  /** Growable byte-backed bitset buffer. */
  final case class Buf(var bytes: Array[Byte])

  private def ensure(b: Buf, byteIdx: Int): Unit =
    if (byteIdx >= b.bytes.length) {
      // grow to the next power of two past the index: amortized O(1)
      var n = math.max(16, b.bytes.length)
      while (n <= byteIdx) n <<= 1
      b.bytes = java.util.Arrays.copyOf(b.bytes, n)
    }

  class BitmapStateAgg extends Aggregator[Long, Buf, Array[Byte]] {
    override def zero: Buf = Buf(Array.emptyByteArray)

    override def reduce(b: Buf, v: Long): Buf = {
      require(v >= 0 && v <= Int.MaxValue,
        s"bitmap_state domain is non-negative ints, got $v")
      val idx = (v >>> 3).toInt
      ensure(b, idx)
      b.bytes(idx) = (b.bytes(idx) | (1 << (v & 7).toInt)).toByte
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      if (y.bytes.length > x.bytes.length) {
        val t = x.bytes; x.bytes = y.bytes.clone(); return mergeInto(x, t)
      }
      mergeInto(x, y.bytes)
    }
    private def mergeInto(x: Buf, small: Array[Byte]): Buf = {
      var i = 0
      while (i < small.length) { x.bytes(i) = (x.bytes(i) | small(i)).toByte; i += 1 }
      x
    }

    // canonical form: trailing zero bytes trimmed, so equal sets have
    // byte-identical states regardless of growth history
    override def finish(b: Buf): Array[Byte] = {
      var n = b.bytes.length
      while (n > 0 && b.bytes(n - 1) == 0) n -= 1
      java.util.Arrays.copyOf(b.bytes, n)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `bitmap_state(col)` aggregate column: serialized membership bitmap. */
  def bitmap_state(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new BitmapStateAgg, Encoders.scalaLong)(c)

  private def popcount(a: Array[Byte]): Long = {
    var n = 0L; var i = 0
    while (i < a.length) { n += java.lang.Integer.bitCount(a(i) & 0xff); i += 1 }
    n
  }

  // The scalar algebra runs on GROUP-cardinality rows (|groups| blobs,
  // |groups|² pairs), never on the corpus — a Scala UDF is fine here; the
  // corpus-sized work is all inside the codegen'd aggregate above.
  val bitmap_cardinality = udf((a: Array[Byte]) => popcount(a))
  val bitmap_and_cardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    val n = math.min(a.length, b.length)
    var c = 0L; var i = 0
    while (i < n) { c += java.lang.Integer.bitCount(a(i) & b(i) & 0xff); i += 1 }
    c
  })
  val bitmap_or_cardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var c = popcount(big); var i = 0
    while (i < small.length) {
      c += java.lang.Integer.bitCount((small(i) & ~big(i)) & 0xff); i += 1
    }
    c
  })
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** Count-min sketch as a typed Aggregator — the third mergeable sketch of
  * the family (HLL distinct = q39, Misra-Gries membership = q69, CMS
  * point frequency = q181): fixed d×w counter matrix, update = +1 at one
  * cell per row, merge = element-wise sum. Unlike MG, the merge is plain
  * commutative addition, so for a FIXED dataset and FIXED hash seeds the
  * final sketch is bit-identical regardless of partitioning, task order
  * or executor count — the estimate itself is reproducible, only not
  * portable to engines without the same hashes.
  *
  * Deterministic guarantees (what q181 gates):
  *   - est(x) ≥ true(x) always — counters only ever over-count.
  *   - est(x) ≤ true(x) + εN with ε = e/w per row in expectation; the
  *     min over d rows makes larger overshoot geometrically unlikely.
  *     The audit bound uses the per-row worst case actually observable
  *     at a vocabulary ≪ w: collisions are the only overshoot source.
  *
  * Scale: the aggregation state is d·w longs (#DEPTH×#WIDTH = 4×512 =
  * 16 KiB) per partial — constant in corpus size, the whole point at
  * 100 TB. Shuffle ships one 16 KiB buffer per map task.
  *
  * Reference context: the reference's ClickHouse target exposes the same
  * family via `topK`/`uniqCombined` (README.md:226-236 TODO list); this
  * is the Spark-native point-frequency member.
  */
object CmsSketch {
  val Depth = 4
  val Width = 512
  // fixed seeds → identical sketches across runs/engines that share them
  private val Seeds: Array[Int] = Array(0x9747b28c, 0x41c64e6d, 0x2545f491, 0x1b873593)

  def bucket(row: Int, item: String): Int = {
    val h = MurmurHash3.stringHash(item, Seeds(row))
    // force non-negative before mod (Int.MinValue-safe)
    (h & 0x7fffffff) % Width
  }

  final case class Buf(counts: Array[Long]) // row-major d×w

  class CmsAgg extends Aggregator[String, Buf, Array[Long]] {
    override def zero: Buf = Buf(new Array[Long](Depth * Width))
    override def reduce(b: Buf, item: String): Buf = {
      var r = 0
      while (r < Depth) { b.counts(r * Width + bucket(r, item)) += 1L; r += 1 }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      a
    }
    override def finish(b: Buf): Array[Long] = b.counts
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** DataFrame form: `cms(col("tok"))` → array<bigint> of d·w counters. */
  val cms: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CmsAgg, Encoders.STRING)

  /** Point query: min over rows of the item's cell. */
  val cmsQuery: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (sketch: Seq[Long], item: String) =>
      var best = Long.MaxValue
      var r = 0
      while (r < Depth) {
        val v = sketch(r * Width + bucket(r, item))
        if (v < best) best = v
        r += 1
      }
      best
    }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed Aggregator (the
  * bounded-memory heavy-hitters primitive a 100 TB corpus needs for
  * vocabulary/boilerplate detection, where q34's exact term counts would
  * shuffle one row per distinct term).
  *
  * Guarantee (standard MG): with k counters over n items, any item with
  * true frequency > n/(k+1) is present in the final sketch, and each
  * reported count undercounts the true frequency by at most n/(k+1).
  * Merge is the counter-wise sum followed by the (k+1)-th-largest
  * subtraction (Agarwal et al.'s mergeable-summaries construction), so
  * partial aggregation ships k-bounded buffers per partition — the same
  * shuffle shape as [[TopK]].
  *
  * The exact counts depend on arrival/merge order, so the sketch is NOT
  * oracle-hash-matchable (like HLL in q39): its query entry is rows-only,
  * and the spec pins the membership guarantee instead.
  */
object FreqSketch {

  // mutable buffer: the reduce path runs once per token, so per-row
  // immutable-map rebuilds would dominate the scan this sketch exists to
  // keep cheap (kryo serializes the HashMap between stages fine)
  final case class Buf(counters: scala.collection.mutable.HashMap[String, Long])

  class FreqAgg(k: Int) extends Aggregator[String, Buf, Seq[(String, Long)]] {
    override def zero: Buf = Buf(scala.collection.mutable.HashMap.empty)

    override def reduce(b: Buf, item: String): Buf = {
      val c = b.counters
      c.get(item) match {
        case Some(n) => c.update(item, n + 1L)
        case None if c.size < k => c.update(item, 1L)
        case None =>
          // decrement-all step; drop zeros, in place
          val dead = List.newBuilder[String]
          c.foreach { case (i, n) =>
            if (n > 1L) c.update(i, n - 1L) else dead += i
          }
          dead.result().foreach(c.remove)
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val c = a.counters
      b.counters.foreach { case (i, n) => c.update(i, c.getOrElse(i, 0L) + n) }
      if (c.size > k) {
        // subtract the (k+1)-th largest count from everyone, keep positives
        val cut = c.values.toSeq.sorted(Ordering[Long].reverse)(k)
        val dead = List.newBuilder[String]
        c.foreach { case (i, n) =>
          if (n > cut) c.update(i, n - cut) else dead += i
        }
        dead.result().foreach(c.remove)
      }
      a
    }

    /** Deterministic presentation: count desc, then item asc. */
    override def finish(b: Buf): Seq[(String, Long)] =
      b.counters.toSeq.sortBy { case (i, n) => (-n, i) }

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Untyped (DataFrame) form: `frequent_items(k)(col("tok"))` →
    * array<struct<_1: string, _2: bigint>>, count-desc then item-asc. */
  def frequent_items(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new FreqAgg(k), Encoders.STRING)
}

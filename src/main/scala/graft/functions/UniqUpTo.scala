package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-up-to-N distinct counter (ClickHouse `uniqUpTo(N)`): returns the
  * exact distinct count while it is ≤ N, and the sentinel N+1 once it
  * exceeds N — with state bounded at N+1 elements per partial buffer.
  *
  * Scale rationale: an exact count-distinct must shuffle every distinct
  * value (two-phase distinct aggregate); HLL (q39) bounds state but is
  * merge-order-dependent, so it cannot gate against an oracle. This
  * aggregate is the third point in the space: bounded state AND a result
  * that is a pure function of the data — "how many distinct, capped"
  * answers the common gating questions ("fewer than N partners?",
  * "cardinality at least N?") without paying for exactness past the cap.
  *
  * Correctness of the cap under partial aggregation: each buffer is the
  * distinct-set of its inputs truncated to N+1 elements. Truncation only
  * ever discards elements when the buffer already holds N+1 distinct
  * values — at which point the final answer is the sentinel regardless of
  * anything discarded, because distinct(union) ≥ distinct(any buffer).
  * Merging unions then re-truncates under the same invariant, so
  * finish() = min(true distinct, N+1) exactly — the DuckDB oracle is
  * `least(count(DISTINCT x), N+1)`.
  */
object UniqUpTo {

  final case class Buf(var values: Set[Long])

  class UniqUpToAgg(n: Int) extends Aggregator[Long, Buf, Long] {
    require(n >= 1, s"uniq_up_to requires n >= 1, got $n")

    override def zero: Buf = Buf(Set.empty)

    override def reduce(b: Buf, v: Long): Buf = {
      if (b.values.size <= n) b.values = b.values + v
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      if (x.values.size <= n)
        x.values = (x.values | y.values).take(n + 1)
      x
    }

    override def finish(b: Buf): Long = math.min(b.values.size, n + 1).toLong
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** DataFrame form: `uniq_up_to(100)(col("user_id"))` → exact distinct
    * count, saturating at 101. */
  def uniq_up_to(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new UniqUpToAgg(n), Encoders.scalaLong)
}

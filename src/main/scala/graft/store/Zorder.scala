package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional data skipping.
  *
  * The reference's MergeTree gets one skipping dimension from
  * `ORDER BY (Time)` (/root/reference/trace-converter.py:24): row-group
  * min/max stats are narrow on Time and useless on every other column.
  * A compound sort key `(Machine, Time)` only helps the LEADING column.
  * Interleaving the bits of two (or more) bucketed dimensions into one
  * sort key makes EVERY interleaved dimension's per-file value range
  * narrow — a point or range predicate on any of them skips most files
  * via ordinary parquet min/max stats, with no index structure at all.
  *
  * At 100 TB this is the difference between "queries filtered by machine
  * read the whole month" and "they read ~1/√files of it": with f files,
  * a z-ordered layout over 2 dimensions gives each file a value range of
  * roughly 1/√f of each dimension's domain (the curve tiles the plane in
  * √f × √f cells), so single-dimension predicates skip all but ~√f of
  * the files — on either dimension, from the same single copy of the
  * data. The cost is only a different sort key at write/compaction time.
  *
  * Dimensions are first normalized to integer cells in [0, 2^bits) by
  * [[cell]] (linear bucketing preserves range locality — hashing would
  * destroy it); [[interleave]] builds the Morton key with plain codegen'd
  * bit arithmetic (no UDF, stays inside WholeStageCodegen).
  */
object Zorder {

  /** Linear bucketing of a numeric column into [0, cells): cell index of
    * v over the CLOSED domain [lo, hi]. Values are clamped, so stray
    * out-of-range rows land in the edge cells instead of corrupting the
    * key. `cells` must be a power of two ≤ 2^21 for [[interleave]]. */
  def cell(v: Column, lo: Long, hi: Long, cells: Int): Column = {
    // divide by the cell width instead of multiplying by `cells` first —
    // (v-lo)*cells overflows a long when the domain spans epoch-nanos.
    // Width rounds up to a power of two so the division is an unsigned
    // shift: Column `/` is DOUBLE division (loses precision past 2^53).
    val minWidth = math.max(1L, (hi - lo) / cells + 1)
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(minWidth - 1) max 0
    // clamp below-lo values BEFORE the unsigned shift (negatives wrap)
    val off = greatest(lit(0L), v.cast("long") - lit(lo))
    least(lit(cells.toLong - 1), shiftrightunsigned(off, shift))
  }

  /** Morton interleave of two cell indexes (bit i of a → bit 2i, bit i of
    * b → bit 2i+1). 21 bits per dimension keeps the key in a positive
    * long. Pure bit arithmetic — codegen'd, no UDF. */
  def interleave(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 21, s"bits must be in [1,21], got $bits")
    (0 until bits).map { i =>
      shiftrightunsigned(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
      shiftrightunsigned(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Cluster df into `nFiles` files z-ordered on the two given cell
    * columns: range-partition by the Morton key (so files tile the
    * z-curve contiguously), sort within each file (so row groups tile it
    * too), drop the key. Use as the write/compaction layout when queries
    * filter on BOTH dimensions — e.g. events by (user bucket, hour). */
  def cluster(df: DataFrame, cellA: Column, cellB: Column, nFiles: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", interleave(cellA, cellB))
    keyed
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}

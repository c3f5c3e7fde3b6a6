package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BitmapAgg: exact set semantics under partial aggregation, canonical
  * serialized form, and the blob-level AND/OR cardinality algebra. */
class BitmapAggSpec extends SparkSpec {

  test("bitmap_state matches count-distinct under many partitions") {
    import spark.implicits._
    // duplicate values across 13 partitions force partial-buffer merges
    val df = (0 until 5000).map(i => (i % 7, (i * 37L) % 911))
      .toDF("g", "v").repartition(13)
    val got = df.groupBy("g")
      .agg(BitmapAgg.bitmap_cardinality(BitmapAgg.bitmap_state(col("v"))).as("n"))
    val want = df.groupBy("g").agg(countDistinct("v").as("n"))
    assert(got.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      want.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
  }

  test("serialized form is canonical: equal sets, equal bytes") {
    import spark.implicits._
    val a = Seq(1L, 900L, 5L).toDF("v").repartition(4)
      .agg(BitmapAgg.bitmap_state(col("v"))).collect()(0).getAs[Array[Byte]](0)
    val b = Seq(900L, 5L, 1L, 5L).toDF("v").coalesce(1)
      .agg(BitmapAgg.bitmap_state(col("v"))).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
    assert(a.last != 0, "trailing zeros must be trimmed")
  }

  test("and/or cardinality match brute-force set algebra") {
    import spark.implicits._
    val x = (0L until 400L by 3L).toSet
    val y = (0L until 400L by 5L).toSet
    val df = x.toSeq.toDF("v").agg(BitmapAgg.bitmap_state(col("v")).as("a"))
      .crossJoin(y.toSeq.toDF("v").agg(BitmapAgg.bitmap_state(col("v")).as("b")))
      .select(
        BitmapAgg.bitmap_and_cardinality(col("a"), col("b")).as("and"),
        BitmapAgg.bitmap_or_cardinality(col("a"), col("b")).as("or"))
    val r = df.collect()(0)
    assert(r.getLong(0) == (x & y).size.toLong)
    assert(r.getLong(1) == (x | y).size.toLong)
  }

  test("64-bit id domains: sparse snowflake-style ids across distant chunks") {
    import spark.implicits._
    // the round-8 regression shape: replica/snowflake ids at k·10⁹ (and
    // beyond int range) must aggregate in O(populated chunks), not
    // O(domain width) — and the algebra must align chunks by KEY, not
    // by buffer offset
    def ids(seed: Long): Set[Long] =
      (0 until 300).map(i => seed + (i * 65537L) % 1000003L).toSet ++
        Set(0L, 3000000092L, Long.MaxValue - 7, 1L << 40)
    val x = ids(2999999000L)
    val y = ids(2999999000L).take(150) ++ ids(8000000000L).take(40)
    val df = x.toSeq.toDF("v").repartition(7)
      .agg(BitmapAgg.bitmap_state(col("v")).as("a"))
      .crossJoin(y.toSeq.toDF("v").agg(BitmapAgg.bitmap_state(col("v")).as("b")))
      .select(
        BitmapAgg.bitmap_cardinality(col("a")).as("na"),
        BitmapAgg.bitmap_cardinality(col("b")).as("nb"),
        BitmapAgg.bitmap_and_cardinality(col("a"), col("b")).as("and"),
        BitmapAgg.bitmap_or_cardinality(col("a"), col("b")).as("or"))
    val r = df.collect()(0)
    assert(r.getLong(0) == x.size.toLong)
    assert(r.getLong(1) == y.size.toLong)
    assert(r.getLong(2) == (x & y).size.toLong)
    assert(r.getLong(3) == (x | y).size.toLong)
    // negative ids stay a loud contract violation
    intercept[Exception] {
      Seq(-1L).toDF("v").agg(BitmapAgg.bitmap_state(col("v"))).collect()
    }
  }

  test("merge never aliases a chunk array between two live buffers") {
    // driver-level unit for the adopt path: after merging small into
    // big, further reduces into the SMALL buffer must not corrupt big
    // (the adopted chunk is a clone, not a shared reference)
    val agg = new BitmapAgg.BitmapStateAgg
    val big = agg.reduce(agg.reduce(agg.zero, 1L), 100000L)  // 2 chunks
    val small = agg.reduce(agg.zero, 1L << 20)               // 1 new chunk
    val merged = agg.merge(big, small)
    val before = agg.finish(merged).toSeq
    agg.reduce(small, (1L << 20) + 5L) // mutate small's original chunk
    assert(agg.finish(merged).toSeq == before,
      "merged buffer changed when the donor buffer was mutated")
  }
}

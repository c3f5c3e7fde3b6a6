package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** uniqUpTo contract: exact below the cap, sentinel N+1 above it, and the
  * bound survives partial aggregation / merge order. */
class UniqUpToSpec extends SparkSpec {

  test("exact below the cap, sentinel above, across many partitions") {
    import spark.implicits._
    // group a: 7 distinct values (< cap 10); group b: 25 distinct (> cap)
    val df = ((1 to 70).map(i => ("a", (i % 7).toLong)) ++
              (1 to 100).map(i => ("b", (i % 25).toLong)))
      .toDF("g", "v").repartition(16)   // force multi-partition merges
    val u = UniqUpTo.uniq_up_to(10)
    val got = df.groupBy("g").agg(u(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 7L, "b" -> 11L))
  }

  test("buffer never exceeds n+1 elements through reduce and merge") {
    val agg = new UniqUpTo.UniqUpToAgg(3)
    val b = (1L to 100L).foldLeft(agg.zero)((acc, v) => agg.reduce(acc, v))
    assert(b.values.size == 4)
    val c = (200L to 300L).foldLeft(agg.zero)((acc, v) => agg.reduce(acc, v))
    val m = agg.merge(b, c)
    assert(m.values.size <= 4 && agg.finish(m) == 4L)
    // merging two small exact buffers stays exact
    val x = agg.reduce(agg.reduce(agg.zero, 1L), 2L)
    val y = agg.reduce(agg.zero, 2L)
    assert(agg.finish(agg.merge(x, y)) == 2L)
  }

  test("boundary: exactly n distinct reports n, n+1 distinct reports sentinel") {
    import spark.implicits._
    val u = UniqUpTo.uniq_up_to(5)
    val exact = (1L to 5L).toDF("v").agg(u(col("v"))).collect()(0).getLong(0)
    val over = (1L to 6L).toDF("v").agg(u(col("v"))).collect()(0).getLong(0)
    assert(exact == 5L && over == 6L)
  }
}

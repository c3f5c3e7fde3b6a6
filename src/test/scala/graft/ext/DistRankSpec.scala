package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistRank must be row-for-row identical to the naive single-partition
  * window it replaces — checked against `row_number`/`ntile`/grouped
  * `row_number` on a fixture with heavy ties, skewed groups, and more
  * partitions than rows (empty range partitions). */
class DistRankSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // skew: group "en" dominates; ties: many equal scores resolved by id
    val rows = (1L to 97L).map { id =>
      val g = if (id % 10 == 0) "de" else if (id % 17 == 0) "fr" else "en"
      (id, g, (id % 7).toDouble)
    }
    rows.toDF("id", "g", "score")
  }

  test("withGlobalRank equals row_number over the same total order") {
    val df = fixture
    val naive = df.withColumn("rk",
      row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
    val DistRank.Ranked(got, totalCol) = DistRank.withGlobalRank(
      df, "rk", Seq(col("score").desc, col("id")))
    // the exact global count rides on every row, inside the plan
    assert(got.select(totalCol).distinct().collect().map(_.getLong(0)).toSeq == Seq(97L))
    assert(got.select("id", "rk").except(naive.select("id", "rk")).isEmpty)
    assert(naive.select("id", "rk").except(got.select("id", "rk")).isEmpty)
  }

  test("withGroupRank equals per-group row_number, global rank rides along") {
    val df = fixture
    val naive = df
      .withColumn("gr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("score"), col("id"))).cast("long"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score"), col("id"))).cast("long"))
    val got = DistRank.withGroupRank(df, Seq("g"), "gr",
      Seq(col("score"), col("id")), globalRankCol = Some("rk")).df
    assert(got.select("id", "gr", "rk").except(naive.select("id", "gr", "rk")).isEmpty)
    assert(naive.select("id", "gr", "rk").except(got.select("id", "gr", "rk")).isEmpty)
  }

  test("withGroupPrefixSum equals the per-group cumsum window plus its total") {
    import spark.implicits._
    // weights exercise zero, ties on the order prefix (id breaks them),
    // skewed groups, and a weight large enough to dominate its group
    val df = fixture.withColumn("w",
      when(col("id") % 13 === 0, lit(0L))
        .when(col("id") === 40, lit(1000L))
        .otherwise((col("id") % 5 + 1).cast("long")))
    val wnd = Window.partitionBy(col("g"))
      .orderBy(col("score"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("cum", sum(col("w")).over(wnd))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy(col("g"))))
    val got = DistRank.withGroupPrefixSum(df, Seq("g"), "w",
      Seq(col("score"), col("id")), "cum", "tot")
    val cols = Seq("id", "cum", "tot")
    assert(got.select(cols.head, cols.tail: _*)
      .except(naive.select(cols.head, cols.tail: _*)).isEmpty)
    assert(naive.select(cols.head, cols.tail: _*)
      .except(got.select(cols.head, cols.tail: _*)).isEmpty)
    // empty input stays empty
    assert(DistRank.withGroupPrefixSum(df.filter(lit(false)), Seq("g"), "w",
      Seq(col("score"), col("id")), "cum", "tot").isEmpty)
    // non-long weights are rejected loudly, not silently truncated
    intercept[IllegalArgumentException] {
      DistRank.withGroupPrefixSum(df.withColumn("w", col("w").cast("double")),
        Seq("g"), "w", Seq(col("score"), col("id")), "cum", "tot")
    }
  }

  test("withGroupPrefixSum with NO groups equals the global cumsum window") {
    // the ungrouped path (q193's value-grain running rank): one global
    // group, cum = the global inclusive prefix, tot = the grand total.
    // Regression-pins the round-14 fix — the partition-local group
    // counter was hardcoded 0 when groupCols was empty, zeroing every
    // ungrouped prefix sum.
    val df = fixture.withColumn("w",
      when(col("id") % 7 === 0, lit(0L)).otherwise((col("id") % 3 + 1).cast("long")))
    val naive = df
      .withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("score"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy()))
    val got = DistRank.withGroupPrefixSum(df, Seq.empty, "w",
      Seq(col("score"), col("id")), "cum", "tot")
    val cols = Seq("id", "cum", "tot")
    assert(got.select(cols.head, cols.tail: _*)
      .except(naive.select(cols.head, cols.tail: _*)).isEmpty)
    assert(naive.select(cols.head, cols.tail: _*)
      .except(got.select(cols.head, cols.tail: _*)).isEmpty)
  }

  test("withNtile equals ANSI ntile for k dividing and not dividing n") {
    val df = fixture
    for (k <- Seq(4, 10, 97, 200)) {
      val naive = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("score"), col("id"))))
      val got = DistRank.withNtile(df, k, "t", Seq(col("score"), col("id")))
      assert(got.select("id", "t").except(naive.select("id", "t")).isEmpty,
        s"ntile($k) diverged")
      assert(naive.select("id", "t").except(got.select("id", "t")).isEmpty,
        s"ntile($k) diverged (missing rows)")
    }
  }

  test("withNtiles (fused multi-metric) equals independent ntile windows") {
    import spark.implicits._
    // integral metrics with ties; unique key breaks them
    val df = (1L to 61L).map(id => (id, (id % 9), (id % 5) * 100L))
      .toDF("id", "m1", "m2")
      .withColumn("m1", col("m1").cast("int"))
    val naive = df
      .withColumn("a", ntile(4).over(Window.orderBy(col("m1"), col("id"))))
      .withColumn("b", ntile(4).over(Window.orderBy(col("m2").desc, col("id"))))
    val got = DistRank.withNtiles(df, 4, "id",
      Seq(("m1", true, "a"), ("m2", false, "b")))
    assert(got.select("id", "a", "b").except(naive.select("id", "a", "b")).isEmpty)
    assert(naive.select("id", "a", "b").except(got.select("id", "a", "b")).isEmpty)
    // payload columns survive the join back
    assert(got.columns.toSet == Set("id", "m1", "m2", "a", "b"))
    // non-integral metrics are rejected loudly (double cast could merge
    // distinct values and corrupt the tie order)
    val bad = df.withColumn("d", col("m1").cast("double"))
    val e = intercept[IllegalArgumentException] {
      DistRank.withNtiles(bad, 4, "id", Seq(("d", true, "t")))
    }
    assert(e.getMessage.contains("integral"))
    // empty specs are rejected, not an opaque empty-reduce crash
    intercept[IllegalArgumentException] {
      DistRank.withNtiles(df, 4, "id", Seq.empty)
    }
  }

  test("withNtiles places NULLs and Long extremes exactly like the window") {
    import spark.implicits._
    // NULL metrics (window: NULLS FIRST asc, NULLS LAST desc) and the
    // values where arithmetic negation breaks (Long.MinValue/MaxValue)
    val df = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, Long.MinValue), (3L, -5L), (4L, 0L),
      (5L, Long.MaxValue), (6L, null), (7L, 42L), (8L, Long.MinValue + 1))
      .toDF("id", "m")
    val naive = df
      .withColumn("a", ntile(3).over(Window.orderBy(col("m").asc, col("id"))))
      .withColumn("b", ntile(3).over(Window.orderBy(col("m").desc, col("id"))))
    val got = DistRank.withNtiles(df, 3, "id",
      Seq(("m", true, "a"), ("m", false, "b")))
    assert(got.select("id", "a", "b").except(naive.select("id", "a", "b")).isEmpty)
    assert(naive.select("id", "a", "b").except(got.select("id", "a", "b")).isEmpty)
  }

  test("NULL group keys rank as their own partition, exactly like PARTITION BY") {
    import spark.implicits._
    val rows = Seq((1L, Some("en"), 3.0), (2L, None, 1.0), (3L, Some("en"), 2.0),
                   (4L, None, 4.0), (5L, Some("de"), 5.0), (6L, None, 2.0))
    val df = rows.map { case (id, g, s) => (id, g.orNull, s) }.toDF("id", "g", "score")
    val naive = df.withColumn("gr", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("score"), col("id"))).cast("long"))
    val got = DistRank.withGroupRank(df, Seq("g"), "gr", Seq(col("score"), col("id"))).df
    assert(got.count() == 6, "NULL-group rows must not be dropped")
    assert(got.select("id", "gr").except(naive.select("id", "gr")).isEmpty)
    assert(naive.select("id", "gr").except(got.select("id", "gr")).isEmpty)
  }

  test("empty input yields empty output") {
    val df = fixture.filter(col("id") < 0)
    val DistRank.Ranked(got, _) = DistRank.withGlobalRank(df, "rk", Seq(col("id")))
    assert(got.isEmpty)
  }

  test("ranks survive a downstream narrow coalesce(1) — the Verify write path") {
    // coalesce(1) folds every upstream partition into ONE task, so a
    // TaskContext-based pid capture would label all rows pid 0 and make
    // per-partition ranks collide; the RDD-split-index construction must
    // keep the ranks exact under exactly this consumer.
    val df = fixture
    val naive = df.withColumn("rk",
      row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
    val got = DistRank.withGlobalRank(df, "rk", Seq(col("score").desc, col("id")))
      .df.coalesce(1)
    val gotRows = got.select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naiveRows = naive.select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotRows == naiveRows)
  }

  test("no WindowExec anywhere in a DistRank plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val got = DistRank.withGroupRank(fixture, Seq("g"), "gr",
      Seq(col("score"), col("id")), globalRankCol = Some("rk")).df
    val wins = got.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty)
  }
}

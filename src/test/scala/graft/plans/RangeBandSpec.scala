package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The point-in-interval banded-equi-join optimizer rule: same answers as
  * the nested-loop plan, but with an equi key the planner can hash on. */
class RangeBandSpec extends SparkSpec {

  private def fixtures: (DataFrame, DataFrame) = {
    import spark.implicits._
    // points at band edges, inside, outside; interval spanning multiple
    // 1h bands; zero-length interval; NULL-bounded interval (never joins)
    val points = Seq(
      (1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:59:59"),
      (3L, "2024-01-01 03:00:00"), (4L, "2024-01-01 07:30:00"),
      (5L, "2024-01-02 00:00:00"), (6L, "2024-01-01 01:30:00")
    ).toDF("pid", "ts_s").select(col("pid"), to_timestamp(col("ts_s")).as("ts"))
    val intervals = Seq(
      (10L, Some("2024-01-01 00:00:00"), Some("2024-01-01 02:30:00")), // spans 3 bands
      (11L, Some("2024-01-01 03:00:00"), Some("2024-01-01 03:00:00")), // zero-length
      (12L, Some("2024-01-01 06:00:00"), None),                        // null hi
      (13L, None, Some("2024-01-01 06:00:00"))                         // null lo
    ).toDF("iid", "lo_s", "hi_s")
      .select(col("iid"), to_timestamp(col("lo_s")).as("lo"),
              to_timestamp(col("hi_s")).as("hi"))
    (points, intervals)
  }

  private def joined(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select(col("pid"), col("iid")).orderBy(col("pid"), col("iid"))

  private def withRule[A](bandSeconds: Long)(f: => A): A = {
    RangeBandRewrite.install(spark)
    spark.conf.set(RangeBandRewrite.ConfKey, bandSeconds.toString)
    try f finally spark.conf.unset(RangeBandRewrite.ConfKey)
  }

  test("banded rewrite returns exactly the nested-loop answer") {
    val (p, i) = fixtures
    val expected = joined(p, i).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 1,2 in interval 10's first band, 6 in its middle band; 3 hits the
    // zero-length interval 11 exactly; 4,5 and the NULL intervals never join
    assert(expected == Seq((1L, 10L), (2L, 10L), (3L, 11L), (6L, 10L)))
    val got = withRule(3600) {
      joined(p, i).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got == expected)
  }

  test("rewrite replaces the nested loop with an equi join in the plan") {
    val (p, i) = fixtures
    val off = joined(p, i).queryExecution.executedPlan.toString
    assert(off.contains("BroadcastNestedLoopJoin"))
    withRule(3600) {
      val on = joined(p, i).queryExecution.executedPlan.toString
      assert(!on.contains("BroadcastNestedLoopJoin"))
      assert(on.contains("BroadcastHashJoin") || on.contains("SortMergeJoin"))
      assert(on.contains("explode") || on.contains("Generate") || on.contains("sequence"))
    }
  }

  test("joins that already have an equi key are left alone") {
    import spark.implicits._
    val a = Seq((1L, 5L)).toDF("k", "v")
    val b = Seq((1L, 0L, 9L)).toDF("k2", "lo", "hi")
    withRule(10) {
      val q = a.join(b, col("k") === col("k2") &&
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(q.count() == 1)
    }
  }

  test("q120's shape engages the rule: aggregated interval side, keyless") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", "error", 0.0),
      (2L, "2024-01-01 01:00:00", "purchase", 5.0),
      (3L, "2024-01-01 09:00:00", "purchase", 7.0)
    ).toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
              col("event_type"), col("value"))
    withRule(3600) {
      val inc = ev.filter(col("event_type") === "error")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 2 HOURS"))
      val q = ev.filter(col("event_type") === "purchase").select(col("ts"), col("value"))
        .join(inc, col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(!q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // only the 01:00 purchase is inside [00:10, 02:10]
      assert(q.select(col("value")).collect().map(_.getDouble(0)).toSeq == Seq(5.0))
    }
  }

  test("inverted intervals (hi < lo) match nothing instead of throwing") {
    import spark.implicits._
    val a = Seq((1L, 7L)).toDF("pid", "x")
    val b = Seq((10L, 9L, 5L)).toDF("iid", "lo", "hi")  // hi < lo
    withRule(10) {
      val q = a.join(b, col("x") >= col("lo") && col("x") <= col("hi"))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(q.count() == 0)                  // Sequence guard, no throw
    }
  }

  test("long (non-timestamp) range keys band on raw units") {
    import spark.implicits._
    val a = Seq((1L, 7L), (2L, 25L)).toDF("pid", "x")
    val b = Seq((10L, 5L, 9L), (11L, 20L, 40L)).toDF("iid", "lo", "hi")
    withRule(10) {
      val q = a.join(b, col("x") >= col("lo") && col("x") <= col("hi"))
        .select(col("pid"), col("iid"))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 10L), (2L, 11L)))
    }
  }
}

package graft.plans

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The native AsOfJoinExec must agree with the window-based formulation
  * (ext.Temporal) on real data, plan as the custom physical node, and
  * honor strict `right.ts < left.ts` semantics. */
class AsOfJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def custom() = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    AsOfJoin(errors, clicks, "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
              col("c_ts").as("prev_click_ts"))
  }

  test("native as-of join matches the window formulation on events") {
    val got = custom().orderBy("event_id").collect()
    val exp = graft.ext.Temporal.q21AsOfJoin(spark, dir)
      .orderBy("event_id").collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g == e, s"\n got=$g\n exp=$e") }
  }

  test("plans through the custom physical operator") {
    val p = custom().queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)   // nodeName strips the Exec suffix
  }

  test("strict semantics: a right row at the exact left timestamp is excluded") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq((7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 09:00:00")))
      .toDF("rk", "rts")
    val got = AsOfJoin(l, r, "k", "rk", "ts", "rts").collect()
    assert(got.length == 1)
    assert(got(0).getTimestamp(4) == ts("2024-01-01 09:00:00"))
  }

  test("same-lineage inputs (self-as-of) resolve via right-side re-aliasing") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val d = Seq((1L, 7L, ts("2024-01-01 09:00:00")),
                (2L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    // output has both sides' columns (names duplicated) — sort driver-side
    val got = AsOfJoin(d, d, "k", "k", "ts", "ts").collect().sortBy(_.getLong(0))
    assert(got.length == 2)
    assert(got(0).isNullAt(5))                                   // 09:00: no prior
    assert(got(1).getTimestamp(5) == ts("2024-01-01 09:00:00"))  // 10:00 ← 09:00
  }

  test("non-long key is rejected at plan build (fail fast)") {
    import spark.implicits._
    val l = Seq(("a", 1L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin(l, l, "k", "k", "ts", "ts")
    }
  }

  test("no prior right row yields nulls (left outer)") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq((8L, ts("2024-01-01 09:00:00"))).toDF("rk", "rts")
    val got = AsOfJoin(l, r, "k", "rk", "ts", "rts").collect()
    assert(got.length == 1 && got(0).isNullAt(3) && got(0).isNullAt(4))
  }

  test("NTZ-typed timestamps join natively (same 8-byte micros)") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    def ntz(df: org.apache.spark.sql.DataFrame, c: String) =
      df.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampNTZType))
    val l = ntz(Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts"), "ts")
    val r = ntz(Seq((7L, ts("2024-01-01 09:00:00"))).toDF("rk", "rts"), "rts")
    val got = AsOfJoin(l, r, "k", "rk", "ts", "rts").collect()
    assert(got.length == 1 && !got(0).isNullAt(4))
  }

  test("mixed LTZ/NTZ timestamp sides are rejected at plan build") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq((7L, ts("2024-01-01 09:00:00"))).toDF("rk", "rts")
      .withColumn("rts", col("rts").cast(org.apache.spark.sql.types.TimestampNTZType))
    intercept[IllegalArgumentException] {
      AsOfJoin(l, r, "k", "rk", "ts", "rts")
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The plain scalar-UDF surface (SURVEY.md §2 checklist "UDF/UDAF/UDTF"):
  * functions.udf registration works for both DataFrame and SQL use. Hot
  * paths in this engine use native codegen Expressions instead (a Scala
  * UDF is a black box to Catalyst: no codegen, no pushdown through it) —
  * this spec pins the escape hatch itself. */
class UdfSpec extends SparkSpec {

  test("scala udf registers for DataFrame and spark.sql use") {
    import spark.implicits._
    val sevBand = udf((s: Int) => if (s >= 30) "high" else if (s >= 20) "mid" else "low")
    val df = Seq(10, 20, 40).toDF("sev")
    assert(df.select(sevBand(col("sev"))).collect().map(_.getString(0)).toSeq ==
      Seq("low", "mid", "high"))
    spark.udf.register("sev_band", sevBand)
    df.createOrReplaceTempView("sev_v")
    try {
      val got = spark.sql("SELECT sev_band(sev) AS b FROM sev_v ORDER BY sev")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("low", "mid", "high"))
    } finally spark.catalog.dropTempView("sev_v")
  }
}

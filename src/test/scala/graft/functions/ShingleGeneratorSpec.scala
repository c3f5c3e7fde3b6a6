package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Custom Generator (UDTF tier): shingle expansion straight off the token
  * array, planned through the same Generate node as built-in explode. */
class ShingleGeneratorSpec extends SparkSpec {

  test("shingle_gen emits (pos, shingle) rows and skips short docs") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r")).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("tk"))
    val got = df.select(col("id"),
        ShingleGenerator.shingle_gen(col("tk"), 3).as(Seq("pos", "shingle")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(got == Seq((1L, 0, "a b c"), (1L, 1, "b c d"), (3L, 0, "p q r")))
  }

  test("shingle_gen agrees with the shingles3 HOF formulation") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" ")),
                   (2L, "only two"), (3L, "a b c")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val viaGen = docs.select(col("doc_id"),
        ShingleGenerator.shingle_gen(col("tk"), 3).as(Seq("pos", "g")))
      .select("doc_id", "g").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaHof = docs.select(col("doc_id"),
        explode(graft.functions.TextHash.shingles3(col("tk"))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaGen == viaHof)
  }

  test("null array elements are skipped like concat_ws, not NPE'd") {
    import spark.implicits._
    val df = Seq(1).toDF("i").select(
      ShingleGenerator.shingle_gen(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")), 2)
        .as(Seq("pos", "shingle")))
    val got = df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((0, "a"), (1, "b"), (2, "b c")))
  }

  test("n < 1 is rejected at analysis, not silently mis-evaluated") {
    import spark.implicits._
    val df = Seq(1).toDF("i")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ShingleGenerator.shingle_gen(array(lit("a"), lit("b")), 0)
        .as(Seq("pos", "shingle"))).collect()
    }
    assert(e.getMessage.contains("n >= 1") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("generator is planned as Generate with pruned input") {
    import spark.implicits._
    val df = Seq((1L, "a b c d")).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("tk"))
      .select(ShingleGenerator.shingle_gen(col("tk"), 2).as(Seq("pos", "shingle")))
    assert(df.queryExecution.executedPlan.toString.contains("Generate"))
    assert(df.collect().length == 3)
  }
}

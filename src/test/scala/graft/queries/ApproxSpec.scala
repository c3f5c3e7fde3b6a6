package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy pins for the sketch-based scale paths the exact queries
  * document as their 100 TB swap (q42/q72 → approx_percentile, q09/q39 →
  * approx_count_distinct). The swaps are only legitimate if the error
  * bounds actually hold on realistic data — these tests pin them so a
  * Spark upgrade or config change that degrades sketch accuracy fails
  * loudly rather than silently corrupting curation gates. */
class ApproxSpec extends SparkSpec {

  test("approx_percentile lands within the rank-error bound of the exact median") {
    val df = spark.range(100000).toDF("i")
      .withColumn("v", (col("i") * col("i") % 9973).cast("double"))
    df.persist()
    try {
      val approx = df.agg(expr("approx_percentile(v, 0.5, 1000)")).head.getDouble(0)
      // accuracy=1000 bounds RANK error by n/1000; assert via the rank of
      // the approximate answer rather than its value (value distance is
      // data-dependent, rank distance is the contract)
      val n = df.count().toDouble
      val rank = df.filter(col("v") <= approx).count().toDouble / n
      assert(math.abs(rank - 0.5) <= 0.005,
        s"approx median at rank $rank, expected 0.5 ± 0.005")
    } finally df.unpersist(false)
  }

  test("approx_count_distinct stays within 5 standard errors at rsd=0.02") {
    val df = spark.range(200000).toDF("i")
      .withColumn("k", col("i") % 50000)          // 50k exact distincts
    val approx = df.agg(approx_count_distinct(col("k"), 0.02)).head.getLong(0)
    assert(math.abs(approx - 50000.0) / 50000.0 <= 0.1,
      s"approx distinct $approx vs exact 50000 beyond 10%")
  }

  test("union of per-group HLL sketch states deduplicates across groups") {
    // q186's semantic core: users 0..999 appear under BOTH types, so the
    // union-of-states must estimate ~1000, never the 2000 a sum of
    // per-group cardinalities would give
    val df = spark.range(1000).toDF("user_id")
      .withColumn("t", lit("a"))
      .unionByName(spark.range(1000).toDF("user_id").withColumn("t", lit("b")))
    val est = df.groupBy(col("t"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("est"))
      .head.getLong(0)
    assert(math.abs(est - 1000.0) / 1000.0 <= 0.05,
      s"union-of-states estimate $est vs exact 1000 beyond 5%")
  }

  test("q186 audit is green at sf0.001") {
    val out = CoreQueries.q186SketchRollup(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 1 && out(0).getBoolean(1))
  }
}

package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RollupRoute contract: eligible aggregates over the raw relation are
  * rewritten to scan the registered rollup (plan-asserted), results match
  * the raw computation exactly, and ineligible shapes are left alone. */
class RollupRouteSpec extends SparkSpec {

  private def scannedPaths(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def fixture(): (String, String) = {
    import spark.implicits._
    val raw = tmpDir("mv-raw") + "/docs.parquet"
    (1L to 100L).map(i => (i, s"src${i % 3}", if (i % 5 == 0) "de" else "en", i * 10))
      .toDF("doc_id", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(raw)
    val rollup = tmpDir("mv-roll")
    spark.read.parquet(raw).groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_n_chars"))
      .write.mode("overwrite").parquet(rollup)
    (raw, rollup)
  }

  test("eligible aggregate routes to the rollup scan and matches raw results") {
    val (raw, rollup) = fixture()
    RollupRoute.register(spark, raw, spark.read.parquet(rollup),
      Seq("source", "lang"), "cnt", Map("n_chars" -> "sum_n_chars"))
    try {
      def q() = spark.read.parquet(raw)
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
        .orderBy(col("source"))

      spark.conf.set(RollupRoute.ConfKey, "false")
      val rawRows = q().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

      spark.conf.set(RollupRoute.ConfKey, "true")
      val routed = q()
      val paths = scannedPaths(routed)
      assert(paths.contains("mv-roll"), s"expected rollup scan, got $paths")
      assert(!paths.contains("mv-raw"), s"raw relation still scanned: $paths")
      assert(routed.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        == rawRows.toSeq)
    } finally {
      spark.conf.set(RollupRoute.ConfKey, "false")
      RollupRoute.clear()
    }
  }

  test("non-key filter and non-decomposable aggregate do NOT route") {
    val (raw, rollup) = fixture()
    RollupRoute.register(spark, raw, spark.read.parquet(rollup),
      Seq("source", "lang"), "cnt", Map("n_chars" -> "sum_n_chars"))
    try {
      spark.conf.set(RollupRoute.ConfKey, "true")
      // filter references a non-key column → must stay on the raw scan
      val f = spark.read.parquet(raw).filter(col("n_chars") > 50)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      assert(scannedPaths(f).contains("mv-raw"))
      // avg() is not registered as decomposable here → raw scan
      val a = spark.read.parquet(raw)
        .groupBy(col("source")).agg(avg(col("n_chars")).as("m"))
      assert(scannedPaths(a).contains("mv-raw"))
      // grouping by a non-key column → raw scan
      val g = spark.read.parquet(raw)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      assert(scannedPaths(g).contains("mv-raw"))
    } finally {
      spark.conf.set(RollupRoute.ConfKey, "false")
      RollupRoute.clear()
    }
  }
}

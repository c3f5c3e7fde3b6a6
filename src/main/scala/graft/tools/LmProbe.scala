package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Stage-level timing probe for q167 (bigram-LM perplexity scoring). */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sfx10_v2")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.ext.TextAnalysis.q167LmScore(spark, "/root/testdata/sf0.001").count() // warm
    val tk = col("tk")
    val biPlan = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("tk"))
      .filter(size(tk) >= 2)
      .select(col("doc_id"), col("source"), explode(zip_with(
        slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = t("bigram explode + localCheckpoint") { biPlan.localCheckpoint(true) }
    t("bigram count()") { bi.count() }
    val cnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    t("lm counts") { cnt.count() }
    t("full q167 (fresh)") { graft.ext.TextAnalysis.q167LmScore(spark, dir).count() }
    t("full q167 (again)") { graft.ext.TextAnalysis.q167LmScore(spark, dir).count() }
    spark.stop()
  }
}

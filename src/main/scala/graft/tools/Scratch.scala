package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    val docs = graft.tables.Tables.documents(spark, dir)
    time("docs-scan")(docs.count())
    val tk = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
    val tris = tk.select(col("doc_id"), array_distinct(shingles3(col("tk"))).as("tris"))
      .filter(size(col("tris")) > 0)
    time("tris")(tris.count())
    val sig = tris.select(col("doc_id"), graft.functions.GraftFunctions.minhash_sig(col("tris")).as("sig"))
    time("sig-expr")(sig.count())
    time("sig-expr-again")(sig.count())
    val bandKeys = transform(sequence(lit(0), lit(3)), b =>
      element_at(col("sig"), b * 4 + 1) +
      element_at(col("sig"), b * 4 + 2) * 31L +
      element_at(col("sig"), b * 4 + 3) * 961L +
      element_at(col("sig"), b * 4 + 4) * 29791L)
    val buckets = sig.select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "bkey")))
    time("buckets")(buckets.count())
    val cands = buckets.as("b1").join(buckets.as("b2"),
        col("b1.band") === col("b2.band") && col("b1.bkey") === col("b2.bkey") &&
        col("b1.doc_id") < col("b2.doc_id"))
      .select(col("b1.doc_id").as("d1"), col("b2.doc_id").as("d2")).distinct()
    time("cands")(cands.count())
    time("full-q26")(graft.ext.Dedup.q26LshPairs(spark, dir).count())
    spark.stop()
  }
}

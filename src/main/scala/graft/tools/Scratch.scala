package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
    val emb = graft.tables.Tables.embeddings(spark, dir)
    time("scan")(emb.count())
    val planes: Seq[Seq[Double]] = (0 until 8).map { j =>
      (1 to 64).map(d => (((j * 64 + d).toLong * 2654435761L) % 2000003L - 1000001L).toDouble)
    }
    val bucketExpr = planes.zipWithIndex.map { case (w, j) =>
      val sdot = aggregate(zip_with(col("embedding"), typedLit(w), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(sdot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withB = emb.withColumn("bucket", bucketExpr)
    time("bucket-only")(withB.count())
    val q = withB.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("bucket"))
    val joined = withB.join(q, "bucket").filter(col("vec_id") =!= col("q_id"))
    time("join-candidates")(joined.count())
    val scored = joined.withColumn("cos",
      graft.ext.Similarity.dot(col("qe"), col("embedding")) /
      (graft.ext.Similarity.norm(col("qe")) * graft.ext.Similarity.norm(col("embedding"))))
    time("scored")(scored.count())
    time("full-q31")(graft.ext.Similarity.q31AnnLsh(spark, dir).count())
    time("full-q26")(graft.ext.Dedup.q26LshPairs(spark, dir).count())
    spark.stop()
  }
}

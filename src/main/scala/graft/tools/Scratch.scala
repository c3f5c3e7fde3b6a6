package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    spark.range(1000000).toDF("id").withColumn("g", col("id") % 100)
      .groupBy("g").count().count()
    graft.tables.Tables.events(spark, dir).count()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q82_gap_fill", "q83_funnel", "q84_retention",
        "q103_time_weighted_avg", "q104_source_drift", "q105_interval_overlap",
        "q106_containment")
    for (round <- 1 to 2; n <- names)
      time(s"$n#$round")(graft.SparkEntry.queries(n)(spark, dir).count())
    spark.stop()
  }
}

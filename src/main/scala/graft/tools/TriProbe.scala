package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component timing for the q182 triangle census at a given SF dir:
  * pair-table build, degree table, wedge+closing join — to attribute
  * the query's cost before optimizing the wrong stage. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[tri] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    time("pairs(build)")(graft.ext.GraphOps.supportedPairs(spark, dir).count())
    time("pairs(warm)")(graft.ext.GraphOps.supportedPairs(spark, dir).count())
    // the OLD id-canonical formulation, inline, same session — the only
    // drift-proof comparison shape (bench/DRIFT_r7.md)
    val up = graft.ext.GraphOps.supportedPairs(spark, dir).select(col("p1"), col("p2"))
    def oldTri(): Long = {
      val e1 = up.select(col("p1").as("a"), col("p2").as("b"))
      val e2 = up.select(col("p1").as("b2"), col("p2").as("c2"))
      val e3 = up.select(col("p1").as("a3"), col("p2").as("c3"))
      e1.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
        .agg(count(lit(1)).as("n_triangles")).count()
    }
    for (r <- 1 to 3) {
      time(s"old-idcanon#$r")(oldTri())
      time(s"new-degorient#$r")(graft.SparkEntry.queries("q182_triangles")(spark, dir).count())
    }
    spark.stop()
  }
}

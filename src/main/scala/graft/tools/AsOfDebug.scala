package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AsOfDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq((7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 09:00:00")))
      .toDF("rk", "rts")
    val j = graft.plans.AsOfJoin(l, r, "k", "rk", "ts", "rts")
    println("=== plan ===")
    println(j.queryExecution.executedPlan.toString)
    println("=== result ===")
    j.collect().foreach(println)
    spark.stop()
  }
}

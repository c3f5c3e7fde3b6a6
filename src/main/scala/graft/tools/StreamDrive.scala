package graft.tools
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulOps, StatefulOps._
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[Ev]
    val q = StatefulOps.sessionize(in.toDS(), 30)
      .writeStream.format("memory").queryName("s").outputMode(OutputMode.Append).start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1.0), Ev(2, ts("2024-01-01 10:05:00"), 9.0),
               Ev(1, ts("2024-01-01 10:20:00"), 2.0))
    q.processAllAvailable()
    in.addData(Ev(1, ts("2024-01-01 13:00:00"), 4.0), Ev(2, ts("2024-01-01 13:00:00"), 1.0))
    q.processAllAvailable()
    println("OUT after-gap-close n=" + spark.table("s").count())
    spark.table("s").collect().foreach(r => println("OUT " + r))
    in.addData(Ev(1, ts("2024-01-01 10:25:00"), 99.0))   // late: far behind watermark
    q.processAllAvailable()
    println("OUT after-late n=" + spark.table("s").count())
    spark.table("s").collect().foreach(r => println("OUT " + r))
    q.stop(); spark.stop()
  }
}

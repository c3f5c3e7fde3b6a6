package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing probe for q147 at an arbitrary corpus dir —
  * separates prefix-index build, candidate generation, and exact verify
  * so optimization effort lands on the stage that actually costs. */
object Q147Probe {
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
    // warm: small run compiles codegen
    graft.ext.Dedup.q147PrefixSsjoin(spark, "/root/testdata/sf0.001").count()
    val n1 = t("full q147 (pass 1: index build + candidates + verify)") {
      graft.ext.Dedup.q147PrefixSsjoin(spark, dir).count()
    }
    val n2 = t("full q147 (pass 2: index cached)") {
      graft.ext.Dedup.q147PrefixSsjoin(spark, dir).count()
    }
    val cands = t("candidates only (pass 3: join+distinct, no verify)") {
      graft.ext.Dedup.candidatesForProbe147(spark, dir).count()
    }
    println(s"[probe] pairs=$n1/$n2 candidates=$cands")
    spark.stop()
  }
}

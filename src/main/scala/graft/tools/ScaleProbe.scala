package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale-up probe: replicate the sf0.1 tables K× (default 10×)
  * with shifted entity ids, then time a cross-section of registered
  * queries at both scales and report the per-query time ratio. The brief
  * grades "would this plan survive a 100× scale-up" — this tool turns
  * that from an argument into a measurement: a query whose plan is
  * corpus-linear should show ratio ≈ K (minus fixed overhead amortized
  * across the larger input, so commonly < K); a quadratic candidate pair
  * explosion or a single-task funnel shows up as ratio >> K.
  *
  * Replication semantics (deliberately realistic, not pathological):
  *  - documents: ids shift by copy·10⁹; copies > 0 get a one-token
  *    suffix, so each replica is a NEAR-duplicate of its source — the
  *    dedup family faces a 10×-denser near-dup graph (clusters of ~K),
  *    which is the shape a real crawl re-scrape produces.
  *  - embeddings: ids shift, vectors unchanged — ANN buckets get K×
  *    denser (worst case for bucket-confined search).
  *  - events: event/user ids shift — K× users over the SAME calendar,
  *    so day/hour-grain tables keep their cardinality while data-grain
  *    work scales (exactly the 100 TB shape: more entities, same time).
  *  - lineitem: ids shift (only key-local probes read it).
  *
  * Usage: runMain graft.tools.ScaleProbe [K] [q...]  (K ≥ 2, default 10)
  */
object ScaleProbe {
  private val DefaultProbes = Seq(
    "q01_time_filter",     // pushdown scan
    "q05_pricing_summary", // partial+final agg
    "q09_distinct_users",  // two-phase distinct
    "q24_dedup_exact",     // hash dedup
    "q26_lsh_pairs",       // banded near-dup join
    "q46_ivf_ann",         // cell-confined ANN
    "q55_dedup_clusters",  // connected components over all-pairs edges
    "q197_star_clusters",  // connected components over star edges (clique-safe)
    "q70_decontaminate",   // broadcast probe dictionary
    "q97_max_intersections", // distributed sweep-line
    "q147_prefix_ssjoin",  // prefix-filtered similarity join
    "q158_decile_lift",    // DistRank ntile (de-funneled window)
    "q193_equiheight_hist", // histogram-based ntile
  )

  def main(args: Array[String]): Unit = {
    val k = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    require(k >= 2, s"replication factor must be ≥ 2, got $k")
    val probes = {
      val names = args.drop(if (args.headOption.exists(_.toIntOption.isDefined)) 1 else 0)
      if (names.isEmpty) DefaultProbes else names.toSeq
    }
    val base = "/root/testdata/sf0.1"
    val big = s"/tmp/graft_sfx$k"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(big, "_READY"))) {
      replicate(spark, base, big, k)
      java.nio.file.Files.createFile(java.nio.file.Paths.get(big, "_READY"))
    }

    val qmap = graft.SparkEntry.queries
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      qmap(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // JIT/codegen warmup on the small side, untimed
    probes.foreach(n => qmap(n)(spark, base).count())
    val rows = probes.map { n =>
      val tS = time(n, base)
      val tB = time(n, big)
      val line = f""""$n":{"base_s":$tS%.2f,"x${k}_s":$tB%.2f,"ratio":${tB / tS}%.1f}"""
      System.err.println(s"[scale] $line")
      line
    }
    println(rows.mkString(s"""{"metric":"scale_probe","k":$k,"queries":{""", ",", "}}"))
    spark.stop()
  }

  /** K-way union with shifted ids, written once. The shift constant 10⁹
    * clears every natural id range in the testdata. */
  private def replicate(spark: SparkSession, base: String, out: String, k: Int): Unit = {
    val S = 1000000000L
    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => shift(df, i)).reduce(_ unionAll _)

    val docs = spark.read.parquet(s"$base/documents.parquet")
    copies(docs) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * S))
        .withColumn("text",
          if (i == 0) col("text") else concat(col("text"), lit(s" v$i")))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    copies(emb) { (d, i) => d.withColumn("vec_id", col("vec_id") + lit(i * S)) }
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = graft.tables.Tables.events(spark, base)
    copies(ev) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * S))
        .withColumn("user_id", col("user_id") + lit(i * S))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    copies(li) { (d, i) => d.withColumn("l_orderkey", col("l_orderkey") + lit(i * S)) }
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // key-joined dimensions the probe queries read unchanged
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders"))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
  }
}

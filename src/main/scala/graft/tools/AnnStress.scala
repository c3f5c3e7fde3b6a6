package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN quality/throughput at stress scale: a planted-cluster corpus
  * (default 200k vectors, 32-dim, 256 centers — ~100× the sf0.1 bench
  * table at the 500k setting) measured two ways:
  *
  *  1. The registered queries (q30/q31/q52/q46, 5 query vectors) for
  *     recall@5 against exact ground truth — the parity check.
  *  2. A 100-query sweep of the same formulations — the amortization
  *     story: exact kNN is O(corpus) *per query*, while the ANN paths pay
  *     one O(corpus) bucket/index pass and then score only candidates, so
  *     their advantage appears (and compounds) with query count. IVF's
  *     index build is timed separately from its query phase.
  *
  * Warmup is untimed (same rationale as Bench): without it the first
  * measured path absorbs ~5 s of one-time JIT/file-index cost — which is
  * how an earlier version of this tool overstated the ANN advantage.
  */
object AnnStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 32
    val kCenters = 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.GraftFunctions.{cosine_sim, lsh_bucket}

    val dir = java.nio.file.Files.createTempDirectory("annstress").toString
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(kCenters, dim)(rnd.nextGaussian().toFloat)
    // cluster members = center + noise; noise small enough that true
    // neighbors are overwhelmingly same-cluster (the regime ANN banks on)
    val vecs = (0 until n).map { i =>
      val c = centers(i % kCenters)
      val v = Array.tabulate(dim)(d => c(d) + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v, i % kCenters)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // ---- untimed warmup: JIT + relation file index
    locally {
      emb.select(lsh_bucket(col("embedding")).as("b")).groupBy("b").count().count()
      graft.SparkEntry.queries("q30_knn_exact")(spark, dir).count()
    }

    def topk(scored: DataFrame, k: Int): DataFrame = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("q_id"), col("rn"), col("vec_id"))
    }
    def collectTop(df: DataFrame): (Double, Map[Long, Seq[Long]]) = {
      val t0 = System.nanoTime()
      val rows = df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, rows.groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      })
    }
    def recall5(truth: Map[Long, Set[Long]], got: Map[Long, Seq[Long]]): Double =
      truth.map { case (q, t) =>
        (got.getOrElse(q, Seq.empty).take(5).toSet & t).size.toDouble / t.size
      }.sum / truth.size

    // ---- parity pass: the registered queries, 5 query vectors
    def timedRegistered(name: String): (Double, Map[Long, Seq[Long]]) = {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir)
        .select("q_id", "rn", "vec_id").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, rows.groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      })
    }
    val (tExact5, truthAll) = timedRegistered("q30_knn_exact")
    val truth5 = truthAll.map { case (q, ids) => q -> ids.take(5).toSet }
    val (tLsh5, lsh5) = timedRegistered("q31_ann_lsh")
    val (tMp5, mp5) = timedRegistered("q52_ann_multiprobe")
    val (tIvf5, ivf5) = timedRegistered("q46_ivf_ann")

    // ---- amortization pass: 100 query vectors, same formulations
    val nq = 100
    val q = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    def scoredOf(cand: DataFrame): DataFrame = cand
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qe"), col("embedding")))

    val (tBruteQ, truthQ) = collectTop(
      topk(scoredOf(emb.crossJoin(broadcast(q))), 5))
    val truthQ5 = truthQ.map { case (k2, ids) => k2 -> ids.take(5).toSet }

    val withB = emb.withColumn("bucket", lsh_bucket(col("embedding")))
    val qB = q.withColumn("bucket", lsh_bucket(col("qe")))
    val (tLshQ, lshQ) = collectTop(topk(scoredOf(withB.join(qB, "bucket")), 5))

    val cents = emb.filter(col("vec_id") % 400 === 0 && col("vec_id") < 400L * 256)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"))
    val tB0 = System.nanoTime()
    val cells = graft.ext.Similarity.assignCells(emb, cents).persist()
    cells.count()
    val tIvfBuild = (System.nanoTime() - tB0) / 1e9
    val qCells = cells.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("c_id"))
    val (tIvfQ, ivfQ) = collectTop(
      topk(scoredOf(cells.join(qCells, "c_id")), 5))
    cells.unpersist(false)

    println(f"""{"metric":"ann_stress","vectors":$n,"dim":$dim,""" +
      f""""exact5_sec":$tExact5%.2f,"lsh5_sec":$tLsh5%.2f,"lsh5_recall":${recall5(truth5, lsh5)}%.3f,""" +
      f""""mp5_sec":$tMp5%.2f,"mp5_recall":${recall5(truth5, mp5)}%.3f,""" +
      f""""ivf5_sec":$tIvf5%.2f,"ivf5_recall":${recall5(truth5, ivf5)}%.3f,""" +
      f""""batch100_brute_sec":$tBruteQ%.2f,""" +
      f""""batch100_lsh_sec":$tLshQ%.2f,"batch100_lsh_recall":${recall5(truthQ5, lshQ)}%.3f,""" +
      f""""batch100_ivf_build_sec":$tIvfBuild%.2f,"batch100_ivf_query_sec":$tIvfQ%.2f,""" +
      f""""batch100_ivf_recall":${recall5(truthQ5, ivfQ)}%.3f}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN quality/throughput at stress scale: a planted-cluster corpus
  * (default 200k vectors, 32-dim, 256 centers — ~30× the sf0.1 bench
  * table) scored by the registered kNN/ANN queries themselves:
  *
  *   q30_knn_exact      brute-force ground truth (corpus × 5 queries)
  *   q31_ann_lsh        single-bucket random-hyperplane LSH
  *   q52_ann_multiprobe LSH + Hamming-1 probe expansion
  *   q46_ivf_ann        cell-confined IVF-style search
  *
  * Reports wall seconds per path plus recall@5 against the exact top-5 —
  * the measured version of SCALE.md's "ANN turns all-pairs into
  * bucket-equi-joins" claim: candidate generation stays corpus-linear
  * while brute force grows with corpus × queries.
  */
object AnnStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 32
    val kCenters = 256
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

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

    def timed(name: String): (Double, Map[Long, Seq[Long]]) = {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir)
        .select("q_id", "rn", "vec_id").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val byQ = rows.groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
      (secs, byQ)
    }

    val (tExact, truth) = timed("q30_knn_exact")
    val truth5 = truth.map { case (q, ids) => q -> ids.take(5).toSet }
    def recall5(got: Map[Long, Seq[Long]]): Double =
      truth5.map { case (q, t) =>
        (got.getOrElse(q, Seq.empty).take(5).toSet & t).size.toDouble / t.size
      }.sum / truth5.size

    val (tLsh, lsh) = timed("q31_ann_lsh")
    val (tMp, mp) = timed("q52_ann_multiprobe")
    val (tIvf, ivf) = timed("q46_ivf_ann")

    println(f"""{"metric":"ann_stress","vectors":$n,"dim":$dim,"exact_sec":$tExact%.2f,""" +
      f""""lsh_sec":$tLsh%.2f,"lsh_recall5":${recall5(lsh)}%.3f,""" +
      f""""multiprobe_sec":$tMp%.2f,"multiprobe_recall5":${recall5(mp)}%.3f,""" +
      f""""ivf_sec":$tIvf%.2f,"ivf_recall5":${recall5(ivf)}%.3f}""")
    spark.stop()
  }
}

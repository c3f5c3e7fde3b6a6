package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH near-dup pipeline at 10× the bench corpus: 50k synthetic docs
  * (500-word vocabulary, ~150 words each) with 500 planted near-duplicate
  * pairs (3 words mutated). Reports wall time, candidate count, and
  * planted-pair recall at jaccard ≥ 0.5 — evidence the q26 pipeline's
  * cost stays linear-ish in corpus size (signature pass is map-only; only
  * band-bucket collisions are pairwise).
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    require(nDocs >= 1000, s"need at least 1000 docs (500 planted pairs), got $nDocs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("dstress").toString
    val rnd = new scala.util.Random(13)
    val vocab = Array.tabulate(500)(i => s"w${i}x")
    def doc(): String =
      (0 until 120 + rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(500))).mkString(" ")
    val base = (0 until nDocs - 500).map(i => (i.toLong, doc()))
    // plant 500 near-dups of the first 500 docs (mutate 3 words)
    val planted = (0 until 500).map { i =>
      val words = base(i)._2.split(" ")
      (0 until 3).foreach(_ => words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(500)))
      ((nDocs - 500 + i).toLong, words.mkString(" "))
    }
    (base ++ planted).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val pairs = graft.ext.Dedup.q26LshPairs(spark, dir)
      .filter(col("jacc") >= 0.5).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 500).map(i => (i.toLong, (nDocs - 500 + i).toLong)).toSet
    val recall = (found & expected).size.toDouble / expected.size
    println(f"""{"metric":"lsh_dedup_stress","docs":$nDocs,"sec":$secs%.2f,"pairs_found":${pairs.length},"planted_recall":$recall%.3f}""")
    spark.stop()
  }
}

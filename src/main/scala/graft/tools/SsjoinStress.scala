package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact prefix-filter similarity join (q147) at 10× the bench corpus:
  * 50k synthetic docs with 500 planted near-duplicate pairs (2 words
  * mutated → shingle Jaccard well above the 0.8 threshold). Reports wall
  * time, output pairs, and planted-pair recall — which must be 1.0: the
  * prefix filter is exhaustive by the prefix-filter lemma, so any planted
  * pair above threshold that is missing would be a correctness bug, not a
  * recall tradeoff. Evidence that the EXACT join (not just LSH) survives
  * corpus growth: candidates key on each doc's rarest shingles, so the
  * pair space stays near-linear while the corpus grows 10×. */
object SsjoinStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    require(nDocs >= 1000, s"need at least 1000 docs (500 planted pairs), got $nDocs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("sstress").toString
    val rnd = new scala.util.Random(17)
    val vocab = Array.tabulate(500)(i => s"w${i}x")
    def doc(): String =
      (0 until 120 + rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(500))).mkString(" ")
    val base = (0 until nDocs - 500).map(i => (i.toLong, doc()))
    // plant 500 near-dups of the first 500 docs (mutate 2 words → ~0.85+ jaccard)
    val planted = (0 until 500).map { i =>
      val words = base(i)._2.split(" ")
      (0 until 2).foreach(_ => words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(500)))
      ((nDocs - 500 + i).toLong, words.mkString(" "))
    }
    (base ++ planted).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val pairs = graft.ext.Dedup.q147PrefixSsjoin(spark, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: planted pairs whose exact jaccard clears the 0.8 gate
    // (2 mutations usually do; compute exactly to count only those)
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val textOf = (base ++ planted).toMap
    val expected = (0 until 500).flatMap { i =>
      val (a, b) = (i.toLong, (nDocs - 500 + i).toLong)
      val (sa, sb) = (sh(textOf(a)), sh(textOf(b)))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if (math.rint(j * 10000) / 10000 >= 0.8) Some((a, b)) else None
    }.toSet
    val recall =
      if (expected.isEmpty) 1.0
      else (found & expected).size.toDouble / expected.size
    println(f"""{"metric":"ssjoin_stress","docs":$nDocs,"sec":$secs%.2f,"pairs_found":${pairs.length},"planted_above_threshold":${expected.size},"planted_recall":$recall%.3f}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** A/B probe for the round-14 fused trigram-minhash kernel
  * ([[graft.functions.TrigramBandKeysExpr]]) against the HOF formulation
  * it replaced in `ChangeFeedQuery.bucketRows` — BOTH shapes in one JVM,
  * same synthetic key corpus (the store's `m<k>/<type>/<id>` shape), so
  * the comparison is epoch-free. Prints per-arm wall seconds at each
  * planted row count; equality of the two arms' checksums re-proves the
  * spec's bit-identity claim at volume.
  *
  * Usage: tools/run-main.sh graft.tools.SigProbe [rows ...]
  */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(2000000L, 8000000L)

    import graft.functions.TextHash
    def hofBandKeys(keyCol: org.apache.spark.sql.Column) = {
      // the pre-round bucketRows expression tree, verbatim
      val tris = array_distinct(
        transform(sequence(lit(1), length(keyCol) - 2), i => substring(keyCol, i, lit(3))))
      val tvs = transform(tris, g => TextHash.tokval(g))
      def sigH(h: Int) =
        aggregate(tvs, lit(TextHash.MinHashP),
          (acc, tv) => least(acc, TextHash.minhashTerm(tv, lit(h))))
      val p = lit(TextHash.MinHashP)
      array(sigH(0) * p + sigH(1), sigH(2) * p + sigH(3))
    }
    def nativeBandKeys(keyCol: org.apache.spark.sql.Column) =
      Shim.column(graft.functions.TrigramBandKeysExpr(Shim.expression(keyCol), 2))

    def corpus(n: Long) = spark.range(n).toDF("id")
      .select(concat(lit("m"), pmod(col("id"), lit(8)), lit("/"),
        element_at(typedLit(Seq("click", "view", "purchase", "error", "scroll")),
          (pmod(col("id"), lit(5)) + 1).cast("int")),
        lit("/"), col("id")).as("key"))

    def time(label: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%8.3f s"); s
    }
    // JIT/codegen warmup on both arms before any timed pass
    corpus(200000L).select(sum(pmod(element_at(hofBandKeys(col("key")), 1), lit(1000000007L)))).count()
    corpus(200000L).select(sum(pmod(element_at(nativeBandKeys(col("key")), 1), lit(1000000007L)))).count()

    for (n <- sizes) {
      val df = corpus(n)
      def sumOf(c: org.apache.spark.sql.Column) =
        // modular checksum: raw bkeys reach P² ~ 4.6e18 and a plain sum
        // overflows Long under ANSI within a few million rows
        df.select(sum(pmod(element_at(c, 1), lit(1000000007L))) +
          sum(pmod(element_at(c, 2), lit(1000000007L)))).collect()(0).getLong(0)
      var a = 0L; var b = 0L
      val tHof = (1 to 3).map(_ => time(s"hof    n=$n") { a = sumOf(hofBandKeys(col("key"))) }).min
      val tNat = (1 to 3).map(_ => time(s"native n=$n") { b = sumOf(nativeBandKeys(col("key"))) }).min
      require(a == b, s"checksum mismatch at n=$n: hof=$a native=$b")
      println(f"== n=$n hof_min=$tHof%.3f native_min=$tNat%.3f speedup=${tHof / tNat}%.1fx checksum_equal=true")
    }
    spark.stop()
  }
}

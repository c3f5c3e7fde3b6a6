package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: membership guarantee (freq > n/(k+1) must
  * survive) and the k-bounded mergeable-buffer shape. */
class FreqSketchSpec extends SparkSpec {

  test("items above the n/(k+1) threshold always survive the sketch") {
    import spark.implicits._
    // n = 4000: "hot" 800× (20%), "warm" 500×, tail = 2700 uniques.
    // k = 16 → threshold n/(k+1) ≈ 235: hot and warm must be present.
    val rows = Seq.fill(800)("hot") ++ Seq.fill(500)("warm") ++
      (1 to 2700).map(i => s"tail$i")
    val df = scala.util.Random.shuffle(rows).toDF("tok").repartition(8)
    val got = df.agg(FreqSketch.frequent_items(16)(col("tok")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("tok"), col("e._2").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("hot") && got.contains("warm"),
      s"heavy hitters missing from ${got.keys}")
    assert(got.size <= 16)
    // undercount bounded: reported >= true - n/(k+1)
    assert(got("hot") >= 800 - 4000 / 17)
    assert(got("hot") <= 800)
  }

  test("q69 audit: every >N/33 token is captured by the k=32 sketch") {
    val out = graft.ext.TextAnalysis.q69HeavyHitters(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 1)
    val row = out(0)
    assert(row.getLong(0) > 0L)                      // audit is non-vacuous
    assert(row.getLong(0) == row.getLong(1))         // n_required == n_captured
    assert(row.getBoolean(2))                        // all_captured
  }
}

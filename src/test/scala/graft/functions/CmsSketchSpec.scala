package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch: never-undercount invariant, collision-bounded
  * overcount, and partitioning-invariance of the merged sketch (the
  * property that makes the q181 audit deterministic). */
class CmsSketchSpec extends SparkSpec {

  test("estimates never undercount and respect the collision bound") {
    import spark.implicits._
    // 26 distinct tokens ≪ width 512 → overshoot only via (unlikely)
    // hash collisions, and est ≥ true always
    val rows = (0 until 26).flatMap(i => Seq.fill(10 * (i + 1))(('a' + i).toChar.toString))
    val df = scala.util.Random.shuffle(rows).toDF("tok").repartition(8)
    val sketch = df.agg(CmsSketch.cms(col("tok")).as("sk"))
    val got = df.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .join(broadcast(sketch))
      .withColumn("est", CmsSketch.cmsQuery(col("sk"), col("tok")))
      .select(col("tok"), col("n"), col("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.size
    got.foreach { case (tok, n, est) =>
      assert(est >= n, s"$tok undercounted: est=$est < true=$n")
      assert((est - n) * (CmsSketch.Width / 2) <= total,
        s"$tok overshoots the 2N/w bound: est=$est true=$n N=$total")
    }
  }

  test("merged sketch is identical under different partitionings") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => s"t${i % 97}")
    def sk(parts: Int): Seq[Long] =
      rows.toDF("tok").repartition(parts)
        .agg(CmsSketch.cms(col("tok")).as("sk"))
        .collect()(0).getSeq[Long](0)
    assert(sk(1) == sk(16)) // commutative adds → partitioning-invariant
  }

  test("q181 audit is non-vacuous and all-green on the corpus") {
    val out = graft.ext.TextAnalysis.q181CmsFrequency(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 10)
    assert(out.forall(_.getBoolean(2)), "a top-10 token broke the CMS bound")
  }
}

package graft.ext

import graft.SparkSpec

/** Planted-fixture tests for the iterative graph operators (q171/q172).
  *
  * Fixture graph: orders {A,B} ×2, {A,C} ×2, {B,C} ×1 — so supported
  * (≥ 2 orders) edges are exactly A–B and A–C (B–C is dropped at
  * support 1), a 2-leaf star with hub A.
  */
class GraphSpec extends SparkSpec {

  // l_orderkey, l_partkey rows for the star fixture (A=1, B=2, C=3)
  private def liDir(): String = {
    import spark.implicits._
    val dir = tmpDir("li")
    Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L),
      (13L, 1L), (13L, 3L),
      (14L, 2L), (14L, 3L),
    ).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("pagerank: integer micro-unit power iteration matches hand computation") {
    // s0 = 1e6 each. Hub A (deg 2), leaves B, C (deg 1):
    //   s1: A = 150000 + 85·(1e6 + 1e6) DIV 100 = 1 850 000
    //       B = C = 150000 + 85·(1e6 DIV 2) DIV 100 = 575 000
    //   s2: A = 150000 + 85·(2·575 000) DIV 100 = 1 127 500
    //       B = C = 150000 + 85·(1 850 000 DIV 2) DIV 100 = 936 250
    //   s3: A = 150000 + 85·(2·936 250) DIV 100 = 1 741 625
    //       B = C = 150000 + 85·(1 127 500 DIV 2) DIV 100 = 629 187
    val got = GraphOps.q171PageRank(spark, liDir())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, 1741625L, 1.741625),
      (2L, 629187L, 0.629187),
      (3L, 629187L, 0.629187)))
  }

  test("bfs: hop histogram from the hub covers the star in one hop") {
    val got = GraphOps.q172BfsReach(spark, liDir())
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0, 1L, 1L, 1L),   // seed: hub A
      (1, 2L, 2L, 3L)))  // both leaves at distance 1; nothing further
  }
}

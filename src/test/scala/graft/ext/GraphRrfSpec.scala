package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted fixtures for triangle counting (q182) and hybrid RRF
  * retrieval (q183). */
class GraphRrfSpec extends SparkSpec {

  test("q182: planted triangle and pendant edge give exact census") {
    import spark.implicits._
    // orders {1,2,3}×2 → supported edges (1,2)(1,3)(2,3) = one triangle;
    // orders {3,4}×2 → pendant edge (3,4). Symmetric degrees 2,2,3,1 →
    // wedges 1+1+3+0 = 5; clustering = 3·1/5 = 0.6
    val dir = tmpDir("tri")
    Seq((10L, 1L), (10L, 2L), (10L, 3L),
        (11L, 1L), (11L, 2L), (11L, 3L),
        (12L, 3L), (12L, 4L),
        (13L, 3L), (13L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GraphOps.q182Triangles(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L)          // n_triangles
    assert(got(0).getLong(1) == 5L)          // n_wedges
    assert(got(0).getDouble(2) == 0.6)       // global_clustering
  }

  test("q183: rank fusion orders by RRF with doc_id tie-break") {
    import spark.implicits._
    val dir = tmpDir("rrf")
    // doc 0 is the query. lexical: d1 (3 hits) > d2 (1) > d3 (0);
    // vector: d1 (cos 1) > d3 (0.6) > d2 (0). d2/d3 tie on RRF
    // (1/62+1/63 both) → doc_id breaks the tie.
    Seq((0L, "x", "s", "en"), (1L, "join join hash", "s", "en"),
        (2L, "join scan", "s", "en"), (3L, "scan sort", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0f), 0),
        (2L, Seq(0f, 1f), 0), (3L, Seq(0.6f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // ranks are LongType: DistRank's exact distributed rank (int32
    // row_number would overflow past 2.1e9 docs)
    val got = Similarity.q183HybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(0) == ((1L, 1L, 1L, math.rint(2.0 / 61 * 1e6) / 1e6)))
    val tied = math.rint((1.0 / 62 + 1.0 / 63) * 1e6) / 1e6
    assert(got(1) == ((2L, 2L, 3L, tied)) && got(2) == ((3L, 3L, 2L, tied)))
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the evaluation/statistics wave: ROC AUC
  * (q165), Spearman rank correlation (q166), and bigram-LM perplexity
  * scoring (q167). */
class EvalStatsSpec extends SparkSpec {

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = tmpDir("emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tmpDir("events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("docs")
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The q165/q155 Achlioptas sign for dimension d (1-based), component 0. */
  private def sign(d: Int): Float =
    if ((d.toLong * 2654435761L) % 2000003L >= 1000001L) 1f else -1f

  // ------------------------------------------------------------- q165 ROC AUC
  test("roc auc: perfectly separated labels give AUC 1 and 0") {
    // v = c · s⃗ (the sign vector scaled) → probe score = 64·c, so the
    // rank order is exactly the order of c. Label 1 takes the two
    // largest scores → one-vs-rest AUC(1) = 1, AUC(0) = 0.
    val sv = (1 to 64).map(sign)
    def vec(c: Float): Seq[Float] = sv.map(_ * c)
    val dir = embDir(Seq(
      (1L, vec(1f), 0), (2L, vec(2f), 0),
      (3L, vec(3f), 1), (4L, vec(4f), 1)))
    val got = Similarity.q165RocAuc(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0) == ((2L, 0.0)))
    assert(got(1) == ((2L, 1.0)))
  }

  test("roc auc: full tie across labels gives 0.5 (average-rank handling)") {
    val sv = (1 to 64).map(sign)
    def vec(c: Float): Seq[Float] = sv.map(_ * c)
    // all four rows share one score → avg rank 2.5 everywhere → AUC 0.5
    val dir = embDir(Seq(
      (1L, vec(2f), 0), (2L, vec(2f), 0),
      (3L, vec(2f), 1), (4L, vec(2f), 1)))
    val got = Similarity.q165RocAuc(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(0) == 0.5 && got(1) == 0.5)
  }

  // ------------------------------------------------------------- q166 Spearman
  test("spearman: nonlinear but monotone drift scores rho = ±1") {
    // type "up": value grows exponentially with time (Pearson < 1 on the
    // raw values, but rank-perfect); type "dn": strictly decreasing.
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "up", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "up", 2.0),
      (3L, "2024-01-01 12:00:00", 1L, "up", 4.0),
      (4L, "2024-01-01 13:00:00", 1L, "up", 100.0),
      (5L, "2024-01-01 10:00:00", 1L, "dn", 9.0),
      (6L, "2024-01-01 11:00:00", 1L, "dn", 5.0),
      (7L, "2024-01-01 12:00:00", 1L, "dn", 1.0))
    val got = SeriesStats.q166Spearman(spark, eventsDir(rows)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got("up") == ((1.0, 4L)))
    assert(got("dn") == ((-1.0, 3L)))
  }

  // ------------------------------------------------------------- q167 LM scoring
  test("lm score: per-source NLL matches the hand-computed bigram model") {
    // corpus bigrams: xy:2, yx:2, xz:1; prefix x:3, y:2
    // doc 1 "x y x y x": nll = 2·(−ln 2/3) + 2·0 → e4 sum 8110, mean 2028
    // doc 2 "x z":        nll = −ln(1/3)    → e4 10986
    val dir = docsDir(Seq((1L, "x y x y x", "A"), (2L, "x z", "B")))
    val got = TextAnalysis.q167LmScore(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") == ((1L, 0.2028, 0.2028)))
    assert(got("B") == ((1L, 1.0986, 1.0986)))
  }
}

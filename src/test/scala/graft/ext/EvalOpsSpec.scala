package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the strict-order funnel (q173), ANN recall
  * evaluation (q174), and deterministic split assignment (q175). */
class EvalOpsSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("ev")
    rows.map { case (id, t, u, ty) =>
      (id, java.sql.Timestamp.valueOf(t), u, ty, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("strict funnel: only consecutive view-click-purchase counts as level 3") {
    def at(m: Int) = f"2024-01-01 10:$m%02d:00"
    val dir = eventsDir(Seq(
      // u1: v c p consecutive → level 3
      (1L, at(1), 1L, "view"), (2L, at(2), 1L, "click"), (3L, at(3), 1L, "purchase"),
      // u2: v e c p — error breaks the chain, no adjacent vc → level 1
      (4L, at(1), 2L, "view"), (5L, at(2), 2L, "error"),
      (6L, at(3), 2L, "click"), (7L, at(4), 2L, "purchase"),
      // u3: c v c p — strict chain present as suffix → level 3
      (8L, at(1), 3L, "click"), (9L, at(2), 3L, "view"),
      (10L, at(3), 3L, "click"), (11L, at(4), 3L, "purchase"),
      // u4: signup only → level 0
      (12L, at(1), 4L, "signup"),
      // u5: v c s — chain stops before purchase → level 2
      (13L, at(1), 5L, "view"), (14L, at(2), 5L, "click"), (15L, at(3), 5L, "signup"),
    ))
    val got = EventAnalytics.q173FunnelStrict(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 2L))
  }

  test("ann recall: identical vectors share one bucket, recall@10 = 1.0") {
    import spark.implicits._
    val dir = tmpDir("emb")
    val v = Seq(1.0f, 2.0f, 3.0f, 4.0f, 0.5f, 1.5f, 2.5f, 3.5f)
    (0L until 12L).map(i => (i, v, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q174AnnRecall(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == 5)
    // every query: 10 exact neighbors, 11 same-bucket candidates, all hit
    got.foreach { case (_, k, nc, nh, rec) =>
      assert(k == 10L && nc == 11L && nh == 10L && rec == 1.0)
    }
  }

  test("dim variance: planted moments, dead dimension flagged by zero variance") {
    import spark.implicits._
    val dir = tmpDir("emb2")
    Seq(
      (0L, Seq(0.0f, 1.0f), 0),
      (1L, Seq(2.0f, 1.0f), 0),
      (2L, Seq(4.0f, 1.0f), 0),
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q176DimVariance(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // dim 1: mean 2, var_pop (4+0+4)/3 = 2.6667; dim 2: constant → var 0
    assert(got.toSeq == Seq((1, 3L, 2.0, 2.6667), (2, 3L, 1.0, 0.0)))
  }

  test("minhash accuracy: identical docs estimate J=1 with zero error") {
    import spark.implicits._
    val dir = tmpDir("docs3")
    val same = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    Seq((1L, same), (2L, same), (3L, other))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.q177MinhashAccuracy(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // only the identical pair survives J ≥ 0.05; all 16 components match
    assert(got.toSeq == Seq((1L, 2L, 16L, 1.0, 1.0, 0.0)))
  }

  test("seasonal index: arithmetic Monday=0 dow, half-up index") {
    // 1970-01-05 was a Monday (epoch day 4 → (4+3)%7 = 0)
    val dir = eventsDir(Seq(
      (1L, "1970-01-05 10:00:00", 1L, "view"),
      (2L, "1970-01-05 11:00:00", 2L, "view"),
      (3L, "1970-01-06 10:00:00", 3L, "view"),
    ))
    val got = SeriesStats.q178SeasonalIndex(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("view", 0L, 2L, 4.6667),   // (2·7·2·10⁴+3) DIV 6 = 46667
      ("view", 1L, 1L, 2.3333)))
  }

  test("decayed sum: dyadic weights are exact, clip beyond 10 days") {
    val dir = eventsDir(Seq(
      (1L, "2024-02-01 10:00:00", 1L, "purchase"),   // ref day, w=1
      (2L, "2024-01-31 10:00:00", 2L, "purchase"),   // Δ1, w=0.5
      (3L, "2024-01-01 10:00:00", 3L, "click"),      // Δ31 → clipped, w=0
    ))
    // eventsDir writes value=1.0 for every row → floor(value)=1
    val got = SeriesStats.q180DecayedSum(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("purchase") == ((2L, 1.5, 1.5)))
    assert(got("click") == ((1L, 0.0, 0.0)))
  }

  test("k-anonymity: small QI groups counted, risky share half-up") {
    import spark.implicits._
    val dir = tmpDir("cust")
    (Seq.fill(5)((1L, "X", 100.0)) ++ Seq.fill(2)((2L, "Y", -50.0)))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = graft.queries.ExtendedQueries.q179KAnonymity(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      == ((2L, 7L, 2L, 1L, 2L, 0.2857)))
  }

  test("split assignment: hash buckets are deterministic, disjoint, exhaustive") {
    import spark.implicits._
    val dir = tmpDir("docs")
    (0L until 100L).map(i => (i, s"tok$i words here", "s1", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.q175SplitAssign(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    // expected counts from the same two-step Lehmer hash, computed
    // independently (one step is monotone for small ids — no mixing)
    val exp = (0L until 100L).groupBy { id =>
      val b = ((id % 2147483647L) * 48271L % 2147483647L) * 48271L % 2147483647L % 100L
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }.view.mapValues(_.size.toLong).toMap
    assert(got.map(t => t._1 -> t._2).toMap == exp)
    assert(got.map(_._2).sum == 100L)                    // exhaustive, disjoint
    got.foreach { case (_, n, share) =>                  // integer half-up share
      assert(share == math.floor(n * 10000.0 / 100 + 0.5) / 10000.0)
    }
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the series-statistics (q107–q110) and
  * corpus-statistics (q111–q114) operators. */
class SeriesCorpusSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
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

  // ------------------------------------------------------------- q107 autocorrelation
  test("autocorr: perfectly alternating daily series gives -1") {
    // daily counts 1,3,1,3,1 → lag-1 pairs (1,3),(3,1),(1,3),(3,1) → r = -1
    var id = 0L
    val rows = Seq("01", "02", "03", "04", "05").zip(Seq(1, 3, 1, 3, 1)).flatMap {
      case (d, n) => (1 to n).map { _ => id += 1; (id, s"2024-01-$d 10:00:00", 1L, "a") }
    }
    val got = SeriesStats.q107Autocorr(spark, eventsDir(rows)).collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "a")
    assert(got(0).getDouble(1) == -1.0)
    assert(got(0).getLong(2) == 4L)
  }

  test("autocorr: degenerate single-pair series yields NULL, not NaN") {
    val rows = Seq((1L, "2024-01-01 10:00:00", 1L, "a"),
                   (2L, "2024-01-02 10:00:00", 1L, "a"))
    val got = SeriesStats.q107Autocorr(spark, eventsDir(rows)).collect()
    assert(got.length == 1 && got(0).isNullAt(1) && got(0).getLong(2) == 1L)
  }

  // ------------------------------------------------------------- q108 Markov transitions
  test("markov: per-user adjacency counts and row-normalized probabilities") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (2L, "2024-01-01 00:01:00", 1L, "b"),
      (3L, "2024-01-01 00:02:00", 1L, "a"),
      (4L, "2024-01-01 00:00:00", 2L, "a"),
      (5L, "2024-01-01 00:01:00", 2L, "b")))
    val got = SeriesStats.q108Markov(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // user1: a→b, b→a; user2: a→b  (no cross-user a←b transition)
    assert(got == Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 1.0))))
  }

  test("markov: ties on ts break by event_id, never across users") {
    val dir = eventsDir(Seq(
      (10L, "2024-01-01 00:00:00", 1L, "x"),
      (11L, "2024-01-01 00:00:00", 1L, "y")))  // same ts: event_id orders x→y
    val got = SeriesStats.q108Markov(spark, dir).collect()
    assert(got.length == 1 &&
      got(0).getString(0) == "x" && got(0).getString(1) == "y")
  }

  // ------------------------------------------------------------- q109 CUSUM changepoint
  test("cusum: level shift flags the last pre-shift day as the changepoint") {
    // counts 1,1,1,5,5,5: D_k = S_k - 3k → -2,-4,-6,-4,-2,0 — max |D| at day 3
    var id = 0L
    val rows = (1 to 6).flatMap { d =>
      val n = if (d <= 3) 1 else 5
      (1 to n).map { _ => id += 1; (id, f"2024-01-$d%02d 09:00:00", 1L, "a") }
    }
    val got = SeriesStats.q109Cusum(spark, eventsDir(rows)).collect()
    assert(got.map(_.getDouble(3)).toSeq == Seq(-2.0, -4.0, -6.0, -4.0, -2.0, 0.0))
    assert(got.map(_.getInt(4)).toSeq == Seq(0, 0, 1, 0, 0, 0))
  }

  // ------------------------------------------------------------- q110 HHI concentration
  test("hhi: dominant user concentration 0.9²+0.1²") {
    var id = 0L
    val rows = (1 to 9).map { _ => id += 1; (id, "2024-01-01 00:00:00", 1L, "a") } :+
      { id += 1; (id, "2024-01-01 00:00:00", 2L, "a") }
    val got = SeriesStats.q110Hhi(spark, eventsDir(rows)).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L)            // n_users
    assert(got(0).getDouble(2) == 0.82)        // hhi
    assert(got(0).getDouble(3) == 0.9)         // top_share
  }

  // ------------------------------------------------------------- q111 entropy
  test("entropy: uniform two-token source hits ln(2) with norm_entropy 1") {
    val dir = docsDir(Seq(
      (1L, "a b a b", "s1"),                   // uniform over {a, b}
      (2L, "c c c c", "s2")))                  // degenerate single token
    val rows = CorpusStats.q111Entropy(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), Option(r.get(4))))).toMap
    // norm divides the 4dp-rounded entropy (same in the oracle SQL):
    // 0.6931 / ln 2 = 0.99993… → 0.9999
    assert(rows("s1") == ((4L, 2L, 0.6931, Some(0.9999))))
    assert(rows("s2")._3 == 0.0)               // -sum(1·ln 1) = 0
    assert(rows("s2")._4.isEmpty)              // norm undefined at vocab=1
  }

  // ------------------------------------------------------------- q112 vocabulary growth
  test("vocab growth: cumulative distinct counts across 100-doc buckets") {
    val dir = docsDir(Seq(
      (0L, "a b", "s"),                        // bucket 0: vocab {a,b}
      (100L, "a c", "s")))                     // bucket 1: introduces only c
    val got = CorpusStats.q112VocabGrowth(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((1L, 2L, 2L, 1.0)))
    assert(got(1L) == ((2L, 4L, 3L, 0.75)))
  }

  // ------------------------------------------------------------- q113 PMI collocations
  test("pmi: repeated adjacent pair ranks first with positive pmi") {
    // "x y" × 40 → bigram (x,y) 40×, (y,x) 39× — only these clear the floor
    val text = Seq.fill(40)("x y").mkString(" ")
    val got = CorpusStats.q113Pmi(spark, docsDir(Seq((1L, text, "s")))).collect()
    assert(got.length == 1)                    // (y,x) at 39 misses the n≥40 floor
    assert(got(0).getInt(0) == 1 &&
      got(0).getString(1) == "x" && got(0).getString(2) == "y")
    assert(got(0).getLong(3) == 40L && got(0).getDouble(4) > 0.0)
  }

  // ------------------------------------------------------------- q114 n-gram novelty
  test("ngram novelty: first doc 1.0, exact copy 0.0, half-overlap in between") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")   // 8 distinct trigrams
    val half = (5 to 14).map(i => s"a$i").mkString(" ") // shares a5..a10 run
    val dir = docsDir(Seq((1L, a, "s"), (2L, a, "s"), (3L, half, "s")))
    val got = Dedup.q114NgramNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((8L, 8L, 1.0)))
    assert(got(2L) == ((8L, 0L, 0.0)))
    // doc3 has 8 trigrams; a5-a6-a7 … a8-a9-a10 (4 of them) were seen in doc1
    assert(got(3L)._1 == 8L && got(3L)._2 == 4L && got(3L)._3 == 0.5)
  }

  // ------------------------------------------------------------- q131 dup-rate report
  test("dup-rate by source: duplicated source half-survives, clean source intact") {
    val t = (1 to 16).map(i => s"w$i").mkString(" ")
    val u = (1 to 16).map(i => s"z$i").mkString(" ")
    val dir = docsDir(Seq((1L, t, "s1"), (2L, t, "s1"), (3L, u, "s2")))
    val got = Dedup.q131DupRateBySource(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("s1") == ((2L, 2L, 1L, 1.0, 0.5)))
    assert(got("s2") == ((1L, 0L, 0L, 0.0, 1.0)))
  }

  // ------------------------------------------------------------- q115 label centroids
  test("label centroid: orthogonal pair coheres at cos 45°, singleton at 1") {
    import spark.implicits._
    val dir = tmpDir("emb")
    Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0), (3L, Seq(3f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q115LabelCentroid(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // label 0: centroid (.5,.5); each member is 45° off → cos = √2/2
    assert(got(0) == ((2L, 0.7071, 0.7071, 0.7071)))
    // label 1: centroid IS the sole member; ‖(3,4)‖ = 5
    assert(got(1) == ((1L, 1.0, 1.0, 5.0)))
  }

  // ------------------------------------------------------------- q116 importance sampling
  test("importance sampling: keeps exactly the LCG-predicted subset") {
    val m = 2147483647L
    def u(id: Long) = (((id % m) * 48271 % m) * 48271 % m).toDouble / 2147483647.0
    val p = 0.1 + 0.9 * math.min(20 / 400.0, 1.0)   // n_chars = 20 below
    val dir = docsDir((0L until 50L).map(i => (i, "x" * 20, "s")))
    val kept = Curation.q116ImportanceSample(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val expected = (0L until 50L).filter(i => u(i) < p).toSet
    assert(kept == expected)
    assert(expected.nonEmpty && expected.size < 50)  // the coin actually flips
  }

  // ------------------------------------------------------------- q122 waiting orders (Q21 shape)
  test("waiting orders: sole laggard counted, single-supplier orders excluded, ties share blame") {
    import spark.implicits._
    val dir = tmpDir("tpch")
    Seq( // (orderkey, suppkey, shipdate)
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-02"),   // B ships last
      (2L, 1L, "2024-01-05"),                           // single supplier: out
      (3L, 1L, "2024-01-03"), (3L, 2L, "2024-01-03"))   // tie: both laggards
      .toDF("l_orderkey", "l_suppkey", "sd")
      .withColumn("l_shipdate", to_date(col("sd"))).drop("sd")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "B")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = graft.queries.ExtendedQueries.q122WaitingOrders(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("B", 2L), ("A", 1L)))
  }

  // ------------------------------------------------------------- q128 Welch t-test
  test("welch t-test: planted cohorts {1,2,3} vs {4,5,6,7}") {
    import spark.implicits._
    val dir = tmpDir("events")
    (Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) => (i.toLong, "purchase", v) } ++
     Seq(4.0, 5.0, 6.0, 7.0).zipWithIndex.map { case (v, i) => (10L + i, "view", v) })
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SeriesStats.q128WelchTTest(spark, dir).collect()(0)
    // m1=2 v1=1 n1=3; m2=5.5 v2=5/3 n2=4 → se=3/4, t=-3.5/√.75=-4.0415,
    // Welch df = .5625/((1/9)/2+(25/144)/3) = 4.96
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == -3.5)
    assert(r.getDouble(3) == -4.0415)
    assert(r.getDouble(4) == 4.96)
  }

  // ------------------------------------------------------------- q129 chi-square
  test("chi-square: planted 2x2 with all-equal expectations gives 20.0 at dof 1") {
    // a: 30 on Mon, 10 on Tue; b: 10 on Mon, 30 on Tue → e=20 per cell,
    // χ² = 4·(10²/20) = 20
    var id = 0L
    def burst(n: Int, day: String, t: String, u: Long) =
      (1 to n).map { _ => id += 1; (id, s"$day 10:00:00", u, t) }
    val rows = burst(30, "2024-01-01", "a", 1L) ++ burst(10, "2024-01-02", "a", 1L) ++
               burst(10, "2024-01-01", "b", 2L) ++ burst(30, "2024-01-02", "b", 2L)
    val got = SeriesStats.q129ChiSquare(spark, eventsDir(rows)).collect()(0)
    assert(got.getLong(0) == 1L && got.getDouble(1) == 20.0)
  }

  // ------------------------------------------------------------- q130 KS test
  test("ks test: planted samples {1,2} vs {2,3} give D = 0.5 exactly") {
    import spark.implicits._
    val dir = tmpDir("events")
    Seq((1L, "purchase", 1.0), (2L, "purchase", 2.0),
        (3L, "view", 2.0), (4L, "view", 3.0))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SeriesStats.q130KsTest(spark, dir).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getDouble(2) == 0.5)
  }

  // ------------------------------------------------------------- q142 block jackknife
  test("block jackknife: two blocks of one purchase each give SE 10") {
    import spark.implicits._
    val dir = tmpDir("events")
    Seq((1L, 1L, 10.0), (2L, 2L, 30.0))
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SeriesStats.q142BlockJackknife(spark, dir).collect()(0)
    // loo means {30, 10}, mean-of-loo 20 → SE = √(½·(100+100)) = 10
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 20.0 && r.getDouble(3) == 10.0)
  }

  // ------------------------------------------------------------- q127 audience overlap
  test("audience overlap: shared users counted once, jaccard from exact cards") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"), (2L, "2024-01-01 00:01:00", 1L, "a"),
      (3L, "2024-01-01 00:02:00", 1L, "b"),  // user 1 in both a and b
      (4L, "2024-01-01 00:03:00", 2L, "a"),  // user 2 only a
      (5L, "2024-01-01 00:04:00", 3L, "b"))) // user 3 only b
    val got = SeriesStats.q127AudienceOverlap(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    // |a∩b|=1, |a|=2, |b|=2 → jaccard 1/3
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) == (("a", "b", 1L, 2L, 2L, 0.3333)))
  }

  // ------------------------------------------------------------- q132 cross-source leakage
  test("cross-source leak: same text under two sources flagged, single-source not") {
    val dir = docsDir(Seq((1L, "x y z", "s1"), (2L, "x y z", "s2"), (3L, "u v w", "s1")))
    val got = Dedup.q132CrossSourceLeak(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L && got(0).getLong(2) == 2L)
    assert(got(0).getSeq[String](3) == Seq("s1", "s2"))
  }

  // ------------------------------------------------------------- q133 path triples
  test("path triples: consecutive type windows per user, lexicographic rank ties") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"), (2L, "2024-01-01 00:01:00", 1L, "b"),
      (3L, "2024-01-01 00:02:00", 1L, "c"), (4L, "2024-01-01 00:03:00", 1L, "d")))
    val got = EventAnalytics.q133PathTriples(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq((1, "a", "b", "c", 1L), (2, "b", "c", "d", 1L)))
  }

  // ------------------------------------------------------------- q134 RFM segments
  test("rfm: recent-frequent-big lands in (1,1,1), the other in (2,2,2)") {
    import spark.implicits._
    val dir = tmpDir("events")
    (Seq((1L, "2024-01-01 10:00:00", 1L, 10.0)) ++
     (2 to 4).map(i => (i.toLong, "2024-01-02 10:00:00", 2L, 20.0)))
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventAnalytics.q134RfmSegments(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map((1, 1, 1) -> ((1L, 60.0)), (2, 2, 2) -> ((1L, 10.0))))
  }

  // ------------------------------------------------------------- q135 cohort LTV
  test("cohort ltv: fixed cohort denominator, cumulative across week offsets") {
    import spark.implicits._
    val dir = tmpDir("events")
    Seq( // u1,u2 cohort week of Jan 1; u1 buys again 2 weeks later
      (1L, "2024-01-01 10:00:00", 1L, 10.0),
      (2L, "2024-01-02 10:00:00", 2L, 30.0),
      (3L, "2024-01-15 10:00:00", 1L, 20.0))
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventAnalytics.q135CohortLtv(spark, dir).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // offset 0: (10+30)/2 = 20/user; offset 2: cum (10+30+20)/2 = 30/user
    assert(got == Map(0 -> ((2L, 20.0)), 2 -> ((2L, 30.0))))
  }

  // ------------------------------------------------------------- q139 funnel latency
  test("funnel latency: in-window conversions only, interpolated median") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 00:01:40", 1L, "click"),    // 100 s
      (3L, "2024-01-01 00:00:00", 2L, "signup"),
      (4L, "2024-01-01 00:05:00", 2L, "click"),    // 300 s
      (5L, "2024-01-01 00:00:00", 3L, "signup"),
      (6L, "2024-01-03 00:00:00", 3L, "click")))   // outside 24 h: dropped
    val r = EventAnalytics.q139FunnelLatency(spark, dir).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 200.0)                // interpolated median of {100, 300}
    assert(r.getDouble(3) == 300.0)
  }

  // ------------------------------------------------------------- q138 forward fill
  test("forward fill: silent hour carries the last reading, flagged as carried") {
    import spark.implicits._
    val dir = tmpDir("events")
    Seq((1L, "2024-01-01 00:10:00", 10.0), (2L, "2024-01-01 02:20:00", 30.0))
      .toDF("event_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("purchase")).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventAnalytics.q138ForwardFill(spark, dir).collect()
      .map(r => (r.getTimestamp(1).toString.take(13), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00", 10.0, 0),
      ("2024-01-01 01", 10.0, 1),    // carried through the silent hour
      ("2024-01-01 02", 30.0, 0)))
  }

  // ------------------------------------------------------------- q137 conversion matrix
  test("conversion matrix: in-window pair counted once per source event") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (2L, "2024-01-01 00:30:00", 1L, "b"),   // converts event 1 (30 min)
      (3L, "2024-01-01 00:40:00", 1L, "b"),   // second b: still ONE distinct a
      (4L, "2024-01-01 03:00:00", 1L, "a"),   // no b within its hour
      (5L, "2024-01-01 00:10:00", 2L, "b")))  // other user: no a before it
    val got = EventAnalytics.q137ConversionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("a", "b")) == ((1L, 2L, 0.5)))  // 1 of 2 a-events converted
    assert(!got.contains(("b", "a")))
  }

  // ------------------------------------------------------------- q136 interval union length
  test("engaged time: overlapping windows merge, disjoint windows add") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click"),   // [00:00, 01:00)
      (2L, "2024-01-01 00:30:00", 1L, "click"),   // overlaps → [00:00, 01:30]
      (3L, "2024-01-01 05:00:00", 1L, "click"),   // disjoint hour
      (4L, "2024-01-01 00:00:00", 2L, "view")))   // not a click: ignored
    val r = Temporal.q136EngagedTime(spark, dir).collect()
    assert(r.length == 1)
    // islands: [00:00,01:30] = 5400 s and [05:00,06:00] = 3600 s
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L &&
      r(0).getLong(2) == 9000L)
  }

  // ------------------------------------------------------------- q141 kNN label vote
  test("knn label vote: planted mislabel outvoted by its bucket neighbors") {
    import spark.implicits._
    val dir = tmpDir("emb")
    Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.99f, 0.01f), 0), (3L, Seq(0.98f, 0.02f), 0),
      (4L, Seq(0.97f, 0.03f), 9),              // mislabeled member of the x-cluster
      (5L, Seq(0f, 1f), 1), (6L, Seq(0.01f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q141KnnLabelVote(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(4L))              // only the planted mislabel flagged
    assert(got(4L) == ((9, 0, 3L)))            // own 9, neighbors vote 0 unanimously
  }

  // ------------------------------------------------------------- q126 session stats
  test("session stats: two sessions, singleton has zero duration") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (2L, "2024-01-01 00:10:00", 1L, "a"),   // same session (10 min gap)
      (3L, "2024-01-01 01:00:00", 1L, "a")))  // 50 min gap: new session
    val r = Temporal.q126SessionStats(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      == ((2L, 3L, 1.5, 300.0, 600.0)))
  }

  // ------------------------------------------------------------- q125 rolling distinct
  test("rolling 7-day distinct: coverage windows overlap and clip at the range end") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 12:00:00", 1L, "a"),
      (2L, "2024-01-05 12:00:00", 2L, "a"),
      (3L, "2024-01-10 12:00:00", 2L, "a")))
    val rows = SeriesStats.q125RollingDistinct(spark, dir).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1))).toSeq
    val exp = (1 to 10).map { d =>
      val day = f"2024-01-$d%02d"
      val n = (if (d <= 7) 1 else 0) + (if (d >= 5) 1 else 0) // u1 covers 1-7, u2 covers 5-10
      (day, n.toLong)
    }
    assert(rows == exp)
  }

  // ------------------------------------------------------------- q143 join fan-out
  test("join fan-out: multiplicity stats over a planted skewed key") {
    import spark.implicits._
    val dir = tmpDir("tpch")
    // orderkey 1 has 3 lines, orderkeys 2..3 have 1 each
    (Seq.fill(3)(1L) ++ Seq(2L, 3L)).zipWithIndex
      .map { case (ok, i) => (ok, i.toLong, 1.0) }
      .toDF("l_orderkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.ExtendedQueries.q143JoinFanout(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 5L)   // 3 keys, 5 rows
    assert(r.getDouble(2) == 1.0 && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 1.8)                      // 3·3/5
  }

  // ------------------------------------------------------------- q123 weighted median
  test("weighted median crosses at half the total quantity") {
    import spark.implicits._
    val dir = tmpDir("tpch")
    Seq( // (returnflag, price, qty, orderkey, linenumber)
      ("A", 10.0, 1.0, 1L, 1L), ("A", 20.0, 2.0, 2L, 1L), ("A", 30.0, 1.0, 3L, 1L),
      ("B", 99.0, 5.0, 4L, 1L))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.ExtendedQueries.q123WeightedMedian(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    // A: qty cum 1,3,4 of 4 → 20.0 is where 2·cum ≥ 4 first; B: singleton
    assert(got == Seq(("A", 20.0, 4L), ("B", 99.0, 5L)))
  }

  // ------------------------------------------------------------- q124 burst collapse
  test("burst collapse keeps burst starters only (strict 30-minute gap)") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "err"),
      (2L, "2024-01-01 00:10:00", 2L, "err"),   // 10 min: same burst
      (3L, "2024-01-01 00:41:00", 3L, "err"),   // 31 min after #2: new burst
      (4L, "2024-01-01 01:11:00", 4L, "err")))  // exactly 30 min: NOT a new burst
    val got = EventAnalytics.q124BurstCollapse(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 4L &&
      got(0).getDouble(3) == 0.5)
  }

  // ------------------------------------------------------------- q121 ordered array agg
  test("group array: users in (ts,event_id) order, capped at five") {
    val dir = eventsDir(Seq(            // insertion order ≠ time order
      (4L, "2024-01-01 00:03:00", 44L, "a"),
      (1L, "2024-01-01 00:00:00", 11L, "a"),
      (3L, "2024-01-01 00:02:00", 33L, "a"),
      (2L, "2024-01-01 00:00:00", 22L, "a"),  // ts tie with 1: event_id orders
      (5L, "2024-01-01 00:04:00", 55L, "a"),
      (6L, "2024-01-01 00:05:00", 66L, "a"))) // 6th: sliced away
    val got = EventAnalytics.q121GroupArray(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "11,22,33,44,55")
    assert(got(0).getLong(2) == 6L)
  }

  // ------------------------------------------------------------- q119 Zipf fit
  test("zipf fit: freqs 4,2 at ranks 1,2 give slope exactly -1") {
    // y = ln(freq), x = ln(rank): (0, ln4), (ln2, ln2) → slope -1,
    // intercept ln4, perfect fit
    val dir = docsDir(Seq((1L, "a a a a b b", "s")))
    val got = CorpusStats.q119ZipfFit(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L)
    assert(got(0).getDouble(2) == -1.0)      // zipf_slope
    assert(got(0).getDouble(3) == 1.3863)    // intercept = ln 4
    assert(got(0).getDouble(4) == 1.0)       // r2
  }

  test("zipf fit: single-token source (zero x-variance) yields NULLs, not NaN") {
    val got = CorpusStats.q119ZipfFit(spark, docsDir(Seq((1L, "a a a", "s")))).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
    assert(got(0).isNullAt(2) && got(0).isNullAt(3) && got(0).isNullAt(4))
  }

  // ------------------------------------------------------------- q140 Good–Turing
  test("good-turing: singleton and doubleton trigram masses from exact counts") {
    // "a b c a b c a b c": trigrams abc×3? no — sliding: abc, bca, cab,
    // abc, bca, cab, abc → abc:3, bca:2, cab:2 → 7 tokens, 3 types,
    // n1=0, n2=2; plus one all-unique doc
    val t1 = "a b c a b c a b c"
    val t2 = "u v w x"                  // uvw, vwx — both singletons
    val dir = docsDir(Seq((1L, t1, "s1"), (2L, t2, "s2")))
    val got = CorpusStats.q140GoodTuring(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("s1") == ((7L, 3L, 0L, 2L, 0.0)))
    assert(got("s2") == ((2L, 2L, 2L, 0L, 1.0)))
  }

  // ------------------------------------------------------------- q117 sparse cosine
  test("sparse cosine: identical docs pair at 1.0, disjoint docs never pair") {
    val dir = docsDir(Seq(
      (1L, "a b c", "s"), (2L, "a b c", "s"), (3L, "x y z", "s")))
    val got = Dedup.q117SparseCosine(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L &&
      got(0).getDouble(2) == 1.0)
  }

  // ------------------------------------------------------------- q145 SCD2 build
  test("scd2: changelog becomes chained validity intervals, only last is current") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (2L, "2024-01-02 00:00:00", 1L, "a"),
      (3L, "2024-01-03 00:00:00", 1L, "a"),
      (4L, "2024-01-05 00:00:00", 2L, "b")))
    val got = EventAnalytics.q145Scd2(spark, dir).collect()
    assert(got.length == 4)
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    // each version closes at the next version's open
    assert(u1(0).getTimestamp(4) == u1(1).getTimestamp(3))
    assert(u1(1).getTimestamp(4) == u1(2).getTimestamp(3))
    assert(u1.map(_.getBoolean(5)).toSeq == Seq(false, false, true))
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getBoolean(5))
  }

  // ------------------------------------------------------------- q146 Gini
  test("gini: uniform counts give 0, planted 1/1/1/97 split gives 0.72") {
    var id = 0L
    def burst(u: Long, tpe: String, n: Int): Seq[(Long, String, Long, String)] =
      (1 to n).map { _ => id += 1; (id, "2024-01-01 10:00:00", u, tpe) }
    val rows = (1L to 4L).flatMap(u => burst(u, "a", 5)) ++
      burst(1L, "b", 1) ++ burst(2L, "b", 1) ++ burst(3L, "b", 1) ++ burst(4L, "b", 97)
    val got = EventAnalytics.q146Gini(spark, eventsDir(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("a") == ((4L, 20L, 0.0)))
    // G = (2*(1+2+3+4*97) - 5*100) / (4*100) = 288/400
    assert(got("b") == ((4L, 100L, 0.72)))
  }

  // ------------------------------------------------------------- q148 as-of tolerance
  test("asof tolerance: fresh prior click joins, stale one nulls out") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click"),
      (2L, "2024-01-01 00:05:00", 1L, "error"),   // 5 min old → fresh
      (3L, "2024-01-01 00:20:00", 1L, "error")))  // 20 min old → stale
    val got = Temporal.q148AsofTolerance(spark, dir).collect()
    assert(got.length == 2)
    assert(!got(0).isNullAt(3) && got(0).getLong(4) == 300000000L)
    assert(got(1).isNullAt(3) && got(1).isNullAt(4))
  }

  // ------------------------------------------------------------- q149 log-bucket percentiles
  test("log histogram: planted 1-second gaps land in bucket 19 (bound 2^20-1)") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a"),
      (2L, "2024-01-01 00:00:01", 1L, "a"),
      (3L, "2024-01-01 00:00:02", 1L, "a")))
    val r = SeriesStats.q149LogHistogram(spark, dir).collect()(0)
    assert(r.getString(0) == "a" && r.getLong(1) == 2L)
    // 1s = 1,000,000 µs ∈ [2^19, 2^20) → upper bound 2^20 − 1
    assert(r.getLong(2) == 1048575L && r.getLong(3) == 1048575L && r.getLong(4) == 1048575L)
  }

  // ------------------------------------------------------------- q150 quantile normalization
  test("quantile norm maps within-source ranks onto the corpus distribution") {
    val dir = docsDir(Seq(
      (1L, "a", "A"), (2L, "ab", "A"), (3L, "abc", "A"), (4L, "abcd", "A"),
      (5L, "x" * 10, "B"), (6L, "y" * 20, "B")))
    val got = CorpusStats.q150QuantileNorm(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](3).longValue).toMap
    // N=6; source A (ns=4) ranks 1..4 → global ranks 2,3,5,6 → 2,3,10,20
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 10L, 4L -> 20L,
                      5L -> 3L, 6L -> 20L))
  }

  // ------------------------------------------------------------- q152 sequence count
  test("sequence count: greedy non-overlapping signup-to-purchase occurrences") {
    // seq "scpspesp": greedy s[^e]*p consumes "scpsp", then "sp" → 2
    val types = Seq("signup", "click", "purchase", "signup", "purchase",
                    "error", "signup", "purchase")
    val rows = types.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, f"2024-01-01 00:0$i:00", 1L, t) }
    val r = EventAnalytics.q152SequenceCount(spark, eventsDir(rows)).collect()(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 8 && r.getInt(2) == 2)
  }

  // ------------------------------------------------------------- q156 audience growth
  test("audience growth: repeat visits don't count, running total accumulates") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 11:00:00", 2L, "a"),
      (3L, "2024-01-02 10:00:00", 1L, "a"),   // repeat — not new
      (4L, "2024-01-03 10:00:00", 3L, "a")))
    val got = EventAnalytics.q156AudienceGrowth(spark, dir).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L)))
  }

  // ------------------------------------------------------------- q157 linear interpolation
  test("interpolation: two-hour gap fills along the line between neighbors") {
    // error values: 10:00 → 10.0, 13:00 → 16.0; 11:00/12:00 missing
    // line: 10 + 6·(k/3) → 12.0 at 11:00, 14.0 at 12:00
    import spark.implicits._
    val dir = tmpDir("events")
    Seq((1L, "2024-01-01 10:00:00", 1L, "error", 10.0),
        (2L, "2024-01-01 13:00:00", 1L, "error", 16.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventAnalytics.q157Interpolate(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((10.0, false), (12.0, true), (14.0, true), (16.0, false)))
  }

  // ------------------------------------------------------------- q158 decile lift
  test("decile lift: concentrated converters in the top decile lift above 1") {
    // 20 users; users 1-2 most active AND the only converters
    var id = 0L
    def ev(u: Long, tpe: String, n: Int) = (1 to n).map { _ =>
      id += 1; (id, "2024-01-01 10:00:00", u, tpe) }
    val rows = ev(1L, "purchase", 10) ++ ev(2L, "purchase", 9) ++
      (3L to 20L).flatMap(u => ev(u, "click", 1))
    val got = EventAnalytics.q158DecileLift(spark, eventsDir(rows)).collect()
    assert(got.length == 10)
    // decile 1 = the two converters: rate 1.0, lift = (2*20)/(2*2) = 10
    assert(got(0).getLong(1) == 2L && got(0).getDouble(3) == 1.0 &&
      got(0).getDouble(4) == 10.0)
    assert(got.drop(1).forall(_.getLong(2) == 0L))   // no converters elsewhere
  }

  // ------------------------------------------------------------- q159 Benford screen
  test("benford: first digits extracted from exact cents, chi2 term exact") {
    import spark.implicits._
    val dir = tmpDir("orders")
    // 123.45 → "12345" → 1; 0.07 → "7" → 7; 999.99 → "99999" → 9
    Seq((1L, 123.45), (2L, 0.07), (3L, 999.99), (4L, 19.99))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.queries.ExtendedQueries.q159Benford(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 2L, 7 -> 1L, 9 -> 1L))
  }

  // ------------------------------------------------------------- q160 session funnel
  test("session funnel: conversion must complete within one session") {
    val rows = Seq(
      // user 1: signup and purchase in ONE session → converted
      (1L, "2024-01-01 10:00:00", 1L, "signup"),
      (2L, "2024-01-01 10:10:00", 1L, "purchase"),
      // user 2: signup, 2h gap, purchase → two sessions, neither converts
      (3L, "2024-01-01 10:00:00", 2L, "signup"),
      (4L, "2024-01-01 12:30:00", 2L, "purchase"))
    val r = Temporal.q160SessionFunnel(spark, eventsDir(rows)).collect()
      .map(x => (x.getLong(0), x.getInt(3)))
    assert(r.toSeq == Seq((1L, 1), (2L, 0), (2L, 0)))
  }

  // ------------------------------------------------------------- q161 co-purchase
  test("co-purchase: pair support and directional confidence from planted baskets") {
    import spark.implicits._
    val dir = tmpDir("li")
    // baskets: {1,2,3}, {1,2}, {1,2}, {3}
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
        (30L, 1L), (30L, 2L), (40L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.ExtendedQueries.q161Copurchase(spark, dir).collect()
    assert(got.length == 1)                        // only (1,2) reaches support 2
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 1.0)                  // conf 1→2: 3/3
    assert(r.getDouble(4) == 1.0)                  // conf 2→1: 3/3
  }

  // ------------------------------------------------------------- q162 sequential pairs
  test("seq pairs: first-occurrence order decides A-then-B support") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 11:00:00", 1L, "b"),
      (3L, "2024-01-01 12:00:00", 1L, "a"),   // repeat a AFTER b — irrelevant
      (4L, "2024-01-01 10:00:00", 2L, "b"),
      (5L, "2024-01-01 11:00:00", 2L, "a")))
    val got = EventAnalytics.q162SeqPairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // user1: a→b; user2: b→a; denominators: 2 users
    assert(got == Map(("a", "b") -> ((1L, 0.5)), ("b", "a") -> ((1L, 0.5))))
  }

  // ------------------------------------------------------------- q163 skyline
  test("skyline keeps exactly the non-dominated (delay, price) points") {
    import spark.implicits._
    val dir = tmpDir("sky")
    // orders: (okey, delay via shipdate, price)
    // pts: A(1d,100) B(2d,200) C(3d,150) D(1d,90) E(2d,200)
    // skyline: A (fastest at its price), B and E (highest price, tie at 2d)
    // C dominated by B; D dominated by A (same delay, lower price)
    Seq((1L, "2024-01-02", 100.0), (2L, "2024-01-03", 200.0),
        (3L, "2024-01-04", 150.0), (4L, "2024-01-02", 90.0),
        (5L, "2024-01-03", 200.0))
      .toDF("o_orderkey", "ship_s", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(lit("2024-01-01")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "2024-01-02"), (2L, "2024-01-03"), (3L, "2024-01-04"),
        (4L, "2024-01-02"), (5L, "2024-01-03"))
      .toDF("l_orderkey", "ship_s")
      .withColumn("l_shipdate", to_timestamp(col("ship_s"))).drop("ship_s")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.ExtendedQueries.q163Skyline(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L))
  }

  // ------------------------------------------------------------- q164 OHLC candles
  test("ohlc: open is earliest, close is latest, high/low bracket the hour") {
    import spark.implicits._
    val dir = tmpDir("events")
    Seq((1L, "2024-01-01 10:05:00", 1L, "a", 5.0),
        (2L, "2024-01-01 10:10:00", 1L, "a", 9.0),
        (3L, "2024-01-01 10:20:00", 1L, "a", 2.0),
        (4L, "2024-01-01 10:55:00", 1L, "a", 7.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SeriesStats.q164Ohlc(spark, dir).collect()(0)
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 9.0 &&
      r.getDouble(3) == 2.0 && r.getDouble(4) == 7.0 && r.getLong(5) == 4L)
  }

  // ------------------------------------------------------------- q118 mislabel screen
  test("mislabel screen: the off-axis member ranks first (worst cohesion)") {
    import spark.implicits._
    val dir = tmpDir("emb")
    Seq((1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0.1f), 0),
        (3L, Seq(1f, -0.1f), 0), (4L, Seq(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.q118MislabelScreen(spark, dir).collect()
    assert(got.length == 3)                       // 4 members, top-3 worst kept
    assert(got(0).getInt(0) == 0 && got(0).getInt(1) == 1 &&
      got(0).getLong(2) == 4L)                    // the (0,1) outlier is rank 1
    assert(got(0).getDouble(3) < got(1).getDouble(3))
  }

  // ------------------------------------------------------------- q190 PSI drift
  test("psi drift: total bin swap gives the closed-form Laplace PSI") {
    import spark.implicits._
    // first half: both events in bin 0 (value 10); second half: both in
    // bin 1 (value 30). With +1 smoothing over 11 bins (n+11 = 13):
    // bin0 (2/13 - ... wait symmetric): (3/13 - 1/13)·ln3 + (1/13 - 3/13)·ln(1/3)
    // = (4/13)·ln3; 9 empty bins contribute 0 (p = q).
    val dir = tmpDir("psi")
    Seq((1L, "2024-01-05 00:00:00", 10.0), (2L, "2024-01-06 00:00:00", 10.0),
        (3L, "2024-01-20 00:00:00", 30.0), (4L, "2024-01-21 00:00:00", 30.0))
      .toDF("event_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("a"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventAnalytics.q190PsiDrift(spark, dir).collect()
    assert(got.length == 1)
    val expected = math.rint(4.0 / 13 * math.log(3.0) * 1e6) / 1e6
    assert(got(0).getDouble(1) == expected, s"psi=${got(0).getDouble(1)} exp=$expected")
  }
}

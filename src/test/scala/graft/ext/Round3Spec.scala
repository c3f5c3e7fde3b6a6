package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the round-3 operators: span-level dedup,
  * bloom-prescreened decontamination, quality-aware canonical selection,
  * BPE merge induction, token-rarity scoring, hard-negative mining, and
  * incremental rollup maintenance. */
class Round3Spec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = tmpDir("emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // ------------------------------------------------------------- q77 span dedup
  test("span dedup: shared 8-token span counted once per doc, unique doc clean") {
    val s1 = (1 to 8).map(i => s"s$i").mkString(" ")        // the shared span
    val a = s1 + " " + (1 to 8).map(i => s"a$i").mkString(" ")
    val b = s1 + " " + (1 to 8).map(i => s"b$i").mkString(" ")
    val c = (1 to 16).map(i => s"c$i").mkString(" ")        // fully unique
    val got = Dedup.q77SpanDedup(spark, docsDir(Seq((1L, a), (2L, b), (3L, c))))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  // ------------------------------------------------------------- q78 bloom decontam
  test("bloom decontamination equals the exact join answer (no lost positives)") {
    val bench = "the quick brown fox jumps over the lazy dog again and again"
    val leaked = s"prefix words then $bench plus a suffix tail"
    val clean = (1 to 20).map(i => s"c$i").mkString(" ")
    // doc_id 0 is the probe (0 % 50 == 0); 1 and 2 are corpus
    val dir = docsDir(Seq((0L, bench), (1L, leaked), (2L, clean)))
    val got = Dedup.q78BloomDecontam(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.contaminated(
      graft.tables.Tables.documents(spark, dir).filter(col("doc_id") % 50 =!= 0),
      graft.tables.Tables.documents(spark, dir).filter(col("doc_id") % 50 === 0), 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(got.contains(1L) && !got.contains(2L))
  }

  // ------------------------------------------------------------- q79 canonical selection
  test("canonical selection keeps the higher-quality member, not the lowest id") {
    // doc 1: 40 unique tokens then tok1 repeated 20 times (low uniq ratio);
    // doc 2: same but one repeat replaced by a new unique token -> near-dup
    // of doc 1 with strictly higher quality, and higher doc_id.
    val toks1 = (1 to 40).map(i => s"tok$i") ++ Seq.fill(20)("tok1")
    val toks2 = toks1.updated(50, "tokZ")
    val far = (1 to 60).map(i => s"zzz$i")
    val dir = docsDir(Seq((1L, toks1.mkString(" ")), (2L, toks2.mkString(" ")),
                          (3L, far.mkString(" "))))
    val rows = Dedup.q79CanonicalSelect(spark, dir).collect()
    val cl = rows.find(_.getLong(0) == 1L)
    assert(cl.isDefined, s"expected cluster rooted at doc 1 in ${rows.mkString(",")}")
    assert(cl.get.getLong(1) == 2L)     // csize
    assert(cl.get.getLong(2) == 2L)     // canonical = higher-quality doc 2
    // and q55's keep flag would have chosen doc 1 — the two policies differ
    val keep = Dedup.q55DedupClusters(spark, dir).collect()
      .filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    assert(keep.contains(1L))
  }

  // ------------------------------------------------------------- q74 BPE merges
  test("BPE merge induction ranks the most frequent adjacent pair first") {
    val dir = docsDir(Seq((1L, "a b a b c"), (2L, "a b x")))
    val top = TextAnalysis.q74BpeMerges(spark, dir).collect()
    assert(top.head.getString(0) == "a b" && top.head.getLong(1) == 3L)
  }

  // ------------------------------------------------------------- q75 token rarity
  test("token rarity: all-unique vocabulary outranks corpus-common vocabulary") {
    val common = (1 to 10).map(_ => "shared").mkString(" ")
    val dir = docsDir(Seq(
      (1L, (1 to 10).map(i => s"rare$i").mkString(" ")),   // df=1 tokens
      (2L, common), (3L, common), (4L, common)))           // df=3 tokens
    val got = TextAnalysis.q75TokenRarity(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 4.0)      // n_tok*N/sum_df = 10*4/10
    assert(got(2L) < got(1L))   // common vocab is less rare
  }

  // ------------------------------------------------------------- q76 hard negatives
  test("hard-negative mining excludes same-label vectors however similar") {
    val dir = embDir(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.99f, 0.1f, 0f, 0f), 0),   // nearly identical but same label
      (2L, Seq(0.9f, 0.3f, 0f, 0f), 1),    // the true hard negative
      (3L, Seq(0f, 1f, 0f, 0f), 1)))
    val rows = Similarity.q76HardNegatives(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
    assert(rows.head.getLong(2) == 2L)               // rank 1 = vec 2
    assert(!rows.exists(_.getLong(2) == 1L))         // same-label excluded
    assert(rows.map(_.getInt(3)).forall(_ == 1))     // all negatives labeled 1
  }

  // ------------------------------------------------------------- event analytics
  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("gap fill emits zero rows for empty hours inside the range") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "purchase"),
      (2L, "2024-01-01 03:20:00", 1L, "purchase"),
      (3L, "2024-01-01 01:00:00", 1L, "click")))     // other type: ignored
    val got = EventAnalytics.q82GapFill(spark, dir).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1))
    assert(got.toSeq == Seq(
      "2024-01-01 00:00:00.0" -> 1L, "2024-01-01 01:00:00.0" -> 0L,
      "2024-01-01 02:00:00.0" -> 0L, "2024-01-01 03:00:00.0" -> 1L))
  }

  test("funnel enforces step order and the 24h window from first signup") {
    val dir = eventsDir(Seq(
      // u1: full ordered funnel inside the window
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),
      // u2: click lands outside the 24h window
      (4L, "2024-01-01 00:00:00", 2L, "signup"),
      (5L, "2024-01-02 06:00:00", 2L, "click"),
      // u3: no signup at all
      (6L, "2024-01-01 00:00:00", 3L, "click"),
      (7L, "2024-01-01 01:00:00", 3L, "purchase"),
      // u4: purchase BEFORE click — must not count as step 3
      (8L, "2024-01-01 00:00:00", 4L, "signup"),
      (9L, "2024-01-01 01:00:00", 4L, "purchase"),
      (10L, "2024-01-01 02:00:00", 4L, "click")))
    val got = EventAnalytics.q83Funnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("retention counts only day-0 cohort members per offset") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 2L, "view"),
      (3L, "2024-01-02 10:00:00", 1L, "view"),
      (4L, "2024-01-04 10:00:00", 1L, "view"),
      (5L, "2024-01-04 11:00:00", 2L, "view"),
      (6L, "2024-01-04 12:00:00", 3L, "view")))   // u3 not in cohort
    val got = EventAnalytics.q84Retention(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0, 2L, 1.0), (1, 1L, 0.5), (3, 2L, 1.0)))
  }

  test("sequence match requires order and rejects an intervening error") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "signup"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),   // s..p clean -> 1
      (4L, "2024-01-01 00:00:00", 2L, "signup"),
      (5L, "2024-01-01 01:00:00", 2L, "error"),
      (6L, "2024-01-01 02:00:00", 2L, "purchase"),   // s e p -> 0
      (7L, "2024-01-01 00:00:00", 3L, "purchase"),
      (8L, "2024-01-01 01:00:00", 3L, "signup")))    // p s -> 0
    val got = EventAnalytics.q86SequenceMatch(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("latest state picks max (ts, event_id) per stream key") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (9L, "2024-01-02 00:00:00", 1L, "view"),       // later ts wins
      (2L, "2024-01-03 00:00:00", 2L, "view"),
      (7L, "2024-01-03 00:00:00", 2L, "view")))      // ts tie: higher id wins
    val got = EventAnalytics.q87LatestState(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 9L, 2L -> 7L))
  }

  // ------------------------------------------------------------- mergeRollups
  test("mergeRollups: rollup maintained in increments equals recomputation") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (i % 7, s"t${i % 3}", i * 0.5))
    val df = rows.toDF("day", "event_type", "value")
    def roll(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("day"), col("event_type"))
        .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"))
    val merged = graft.store.TraceStore.mergeRollups(
        roll(df.filter(col("value") < 50)), roll(df.filter(col("value") >= 50)),
        Seq("day", "event_type"), Seq("sv", "n"))
      .select(col("day"), col("event_type"), round(col("sv"), 6).as("sv"), col("n"))
    val direct = roll(df)
      .select(col("day"), col("event_type"), round(col("sv"), 6).as("sv"), col("n"))
    assert(merged.collect().toSet == direct.collect().toSet)
  }

  // ------------------------------------------------------------- q97 max intersections
  test("max intersections: planted overlap peak, touching endpoints count") {
    // user-day spans: u1 10:00–12:00, u2 11:00–13:00, u5 10:30–11:30,
    // u4 11:30–11:45. At 11:30 u4 starts exactly when u5 ends — starts
    // sort first, so all four are momentarily concurrent.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"), (2L, "2024-01-01 12:00:00", 1L, "click"),
      (3L, "2024-01-01 11:00:00", 2L, "click"), (4L, "2024-01-01 13:00:00", 2L, "click"),
      (5L, "2024-01-01 10:30:00", 5L, "click"), (6L, "2024-01-01 11:30:00", 5L, "click"),
      (7L, "2024-01-01 11:30:00", 4L, "click"), (8L, "2024-01-01 11:45:00", 4L, "click")))
    val rows = EventAnalytics.q97MaxIntersections(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 4L)
    assert(rows.head.getTimestamp(1).toString == "2024-01-01 11:30:00.0")
  }

  test("max intersections: cross-day offsets carry concurrency over blocks") {
    // u1 spans day1 only; u2 and u3 overlap on day2. The day-2 running
    // sum must start from the day-1 net total (0), not from u1's +1.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"), (2L, "2024-01-01 11:00:00", 1L, "click"),
      (3L, "2024-01-02 10:00:00", 2L, "click"), (4L, "2024-01-02 12:00:00", 2L, "click"),
      (5L, "2024-01-02 11:00:00", 3L, "click"), (6L, "2024-01-02 13:00:00", 3L, "click")))
    val rows = EventAnalytics.q97MaxIntersections(spark, dir).collect()
    assert(rows.head.getLong(0) == 2L)
    assert(rows.head.getTimestamp(1).toString == "2024-01-02 11:00:00.0")
  }

  // ------------------------------------------------------------- q98 attribution
  test("attribution credits purchases to the last click within one hour") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:30:00", 1L, "purchase"),   // 30 min after click: credited
      (3L, "2024-01-01 09:00:00", 2L, "click"),
      (4L, "2024-01-01 10:30:00", 2L, "purchase"),   // 90 min: not credited
      (5L, "2024-01-01 10:00:00", 3L, "purchase"),   // no click at all
      (6L, "2024-01-01 11:30:00", 1L, "click"),
      (7L, "2024-01-01 12:00:00", 1L, "purchase")))  // second click credits again
    val r = EventAnalytics.q98Attribution(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 4L)                  // n_purchases
    assert(r.head.getLong(2) == 2L)                  // n_attributed
    assert(r.head.getDouble(3) == 2.0)               // value 1.0 each
  }

  // ------------------------------------------------------------- q99 anomaly
  test("anomaly screen: needs a full 7-day baseline and flags the planted spike") {
    // days 1..8 alternate 1,2,1,2,... events; day 9 has 10 events.
    val base = (1 to 8).flatMap { d =>
      val n = if (d % 2 == 0) 2 else 1
      (1 to n).map(i => (d * 100L + i, f"2024-01-0$d%d 10:0$i%d:00", i.toLong, "click"))
    }
    val spike = (1 to 10).map(i => (900L + i, f"2024-01-09 10:${i + 10}%d:00", i.toLong, "click"))
    val dir = eventsDir(base ++ spike)
    val rows = EventAnalytics.q99Anomaly(spark, dir).collect()
    assert(rows.length == 2)                         // only days 8 and 9 have 7 prior days
    val day9 = rows.last
    assert(day9.getLong(2) == 10L)
    assert(day9.getInt(5) == 1)                      // flagged
    assert(rows.head.getInt(5) == 0)                 // day 8 is in-pattern
  }

  // ------------------------------------------------------------- q101 ema / q102 counter rate
  private def eventsDirV(rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tmpDir("eventsv")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ema halves each older event's weight") {
    val dir = eventsDirV(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 2.0),
      (2L, "2024-01-01 11:00:00", 1L, "click", 4.0),
      (3L, "2024-01-01 12:00:00", 1L, "click", 8.0)))
    val got = EventAnalytics.q101Ema(spark, dir).collect()
      .map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(got(1L) == 1.0)     // 2/2
    assert(got(2L) == 2.5)     // 4/2 + 2/4
    assert(got(3L) == 5.25)    // 8/2 + 4/4 + 2/8
  }

  test("counter rate sums positive deltas only and counts resets") {
    val dir = eventsDirV(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 3.0),   // +2
      (3L, "2024-01-01 11:00:00", 1L, "click", 2.0),   // reset (-1)
      (4L, "2024-01-01 12:00:00", 1L, "click", 5.0)))  // +3
    val r = EventAnalytics.q102CounterRate(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 3L)        // n_deltas
    assert(r.head.getLong(2) == 1L)        // n_resets
    assert(r.head.getDouble(3) == 5.0)     // increase
    assert(r.head.getDouble(4) == 2.5)     // 5.0 over the 2 h span
  }

  // ------------------------------------------------------------- q100 winsorize
  test("winsorization clips the tail beyond the nearest-rank p05/p95 of 1..20") {
    import spark.implicits._
    val dir = tmpDir("orders")
    (1 to 20).map(i => ("A", i.toDouble, i.toLong))
      .toDF("o_orderpriority", "o_totalprice", "o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.ExtendedQueries.q100Winsorize(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 20L)                 // n
    // nearest-rank: lo = ceil(20/20) = 1st value (1.0), hi = 19th (19.0)
    assert(r.head.getLong(2) == 0L)                  // nothing below 1.0
    assert(r.head.getLong(3) == 1L)                  // 20.0 clips to 19.0
    assert(r.head.getDouble(4) == 209.0)             // 210 - 20 + 19
    assert(r.head.getDouble(5) == 10.45)
  }
}

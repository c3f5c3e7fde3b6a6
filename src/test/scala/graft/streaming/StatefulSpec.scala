package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful streaming: watermark-bounded dedup + custom session state. */
class StatefulSpec extends SparkSpec {

  import StatefulOps._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark removes re-delivered rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = dedupStream(in.toDF(), "ts", "1 hour", "user_id", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1.0),
               Ev(1, ts("2024-01-01 10:00:00"), 1.0),   // duplicate in-batch
               Ev(2, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1.0))   // re-delivery next batch
    q.processAllAvailable()
    val n = spark.table("dedup_out").count()
    q.stop()
    assert(n == 2)
  }

  test("flatMapGroupsWithState emits closed sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    // session 1: two events 10 min apart; then a 2-hour gap closes it
    in.addData(Ev(7, ts("2024-01-01 10:00:00"), 1.0),
               Ev(7, ts("2024-01-01 10:10:00"), 2.0))
    q.processAllAvailable()
    in.addData(Ev(7, ts("2024-01-01 12:30:00"), 5.0))
    q.processAllAvailable()
    val rows = spark.table("sess_out").as[SessionOut].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows(0).user_id == 7 && rows(0).n == 2 && rows(0).sv == 3.0)
    assert(rows(0).session_start == ts("2024-01-01 10:00:00"))
  }

  test("stream-stream interval join correlates clicks to a bounded window after impressions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val q = StatefulOps.intervalJoin(
        clicks.toDF().toDF("c_ad", "c_ts"), imps.toDF().toDF("i_ad", "i_ts"),
        "c_ad", "i_ad", "c_ts", "i_ts", delay = "1 hour", within = "10 minutes")
      .select("c_ad", "c_ts", "i_ts")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append).start()
    imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, ts("2024-01-01 10:05:00")),   // within 10 min → match
      (2L, ts("2024-01-01 10:30:00")),   // 30 min later → no match
      (3L, ts("2024-01-01 10:01:00")))   // never impressed → no match
    q.processAllAvailable()
    val got = spark.table("ij_out").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    q.stop()
    assert(got.toSeq == Seq((1L, ts("2024-01-01 10:05:00"))))
  }

  test("nearDupStream suppresses minhash-identical re-arrivals, passes novel docs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val q = StatefulOps.nearDupStream(
        in.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    in.addData((1L, base, ts("2024-01-01 10:00:00")),
               (2L, other, ts("2024-01-01 10:00:30")),
               (3L, "hi", ts("2024-01-01 10:00:40")))      // short-doc fallback
    q.processAllAvailable()
    in.addData((4L, base, ts("2024-01-01 10:01:00")),      // exact re-arrival: same sig
               (5L, "hi", ts("2024-01-01 10:01:10")))      // short-doc exact dup
    q.processAllAvailable()
    val kept = spark.table("neardup_out").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(kept == Seq(1L, 2L, 3L))
  }

  test("sessionize absorbs a late out-of-order event without moving the horizon backwards") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionize(in.toDS(), gapMinutes = 30, delay = "1 minute")
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(9, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // late arrival earlier than everything seen: must extend the session
      // backwards (start = min), not drag `last` (the timeout base) back
      in.addData(Ev(9, ts("2024-01-01 09:59:30"), 2.0))
      q.processAllAvailable()
      in.addData(Ev(9, ts("2024-01-01 13:00:00"), 5.0))   // gap closes it
      q.processAllAvailable()
      val rows = spark.table("sess_ooo").as[SessionOut].collect()
      assert(rows.length == 1)
      assert(rows(0).session_start == ts("2024-01-01 09:59:30"))
      assert(rows(0).n == 2 && rows(0).sv == 3.0)
    } finally q.stop()
  }

  test("sessionize merges pre-session late events with each other, not into singletons") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = sessionize(in.toDS(), gapMinutes = 30, delay = "10 hours")
      .writeStream.format("memory").queryName("sess_pre")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(3, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // two late events far before the live session, 5 s apart: ONE
      // 2-event closed session, not two singletons
      in.addData(Ev(3, ts("2024-01-01 10:30:00"), 2.0),
                 Ev(3, ts("2024-01-01 10:30:05"), 3.0))
      q.processAllAvailable()
      val rows = spark.table("sess_pre").as[SessionOut].collect()
      assert(rows.length == 1, s"expected one merged pre-session, got ${rows.toSeq}")
      assert(rows(0).session_start == ts("2024-01-01 10:30:00"))
      assert(rows(0).n == 2 && rows(0).sv == 5.0)
    } finally q.stop()
  }

  test("streaming HLL distinct state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StatefulOps.TypedUser]
      val q = StatefulOps.distinctUsersStream(in.toDS())
        .writeStream.format("memory").queryName("hll_out")
        .outputMode(OutputMode.Append).start()
      try {
        // batch 1: type a sees users 1,2,2 → 2 distinct
        in.addData(StatefulOps.TypedUser("a", 1), StatefulOps.TypedUser("a", 2),
                   StatefulOps.TypedUser("a", 2))
        q.processAllAvailable()
        // batch 2: type a re-sees 2 and adds 3 (→ 3 distinct, state
        // carried over); type b starts fresh with 1 distinct
        in.addData(StatefulOps.TypedUser("a", 2), StatefulOps.TypedUser("a", 3),
                   StatefulOps.TypedUser("b", 9))
        q.processAllAvailable()
        val rows = spark.table("hll_out").as[StatefulOps.DistinctEst].collect()
          .groupBy(_.event_type).view.mapValues(_.map(_.est_users).sorted.toSeq).toMap
        // HLL is exact in sparse mode at these cardinalities
        assert(rows("a") == Seq(2L, 3L), s"got $rows")
        assert(rows("b") == Seq(1L), s"got $rows")
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming Misra-Gries keeps the heavy token across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StatefulOps.KeyedTok]
      val q = StatefulOps.heavyHittersStream(in.toDS(), capacity = 4)
        .writeStream.format("memory").queryName("mg_out")
        .outputMode(OutputMode.Append).start()
      try {
        // batch 1: "hot" dominates key a (6 of 10)
        in.addData((Seq.fill(6)("hot") ++ Seq("t1", "t2", "t3", "t4"))
          .map(StatefulOps.KeyedTok("a", _)): _*)
        q.processAllAvailable()
        // batch 2: more hot + churn; hot must still lead (state carried)
        in.addData((Seq.fill(4)("hot") ++ Seq("t5", "t6", "t7"))
          .map(StatefulOps.KeyedTok("a", _)): _*)
        q.processAllAvailable()
        val rows = spark.table("mg_out").as[StatefulOps.HeavyHitters].collect()
        assert(rows.length == 2)
        rows.foreach { r =>
          assert(r.top.head == "hot", s"hot not leading in $r")
          assert(r.n_tracked <= 4)                  // k-bounded state
        }
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState latest-state emits only state-advancing changes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StatefulOps.Upd]
      val q = StatefulOps.latestStateStream(in.toDS())
        .writeStream.format("memory").queryName("latest_out")
        .outputMode(OutputMode.Append).start()
      try {
        // batch 1: out-of-order within the batch → both advance (folded in ts order)
        in.addData(StatefulOps.Upd(1, ts("2024-01-01 10:10:00"), 10.0),
                   StatefulOps.Upd(1, ts("2024-01-01 10:05:00"), 5.0))
        q.processAllAvailable()
        // batch 2: stale update + duplicate delivery absorbed; new key passes
        in.addData(StatefulOps.Upd(1, ts("2024-01-01 10:07:00"), 7.0),
                   StatefulOps.Upd(1, ts("2024-01-01 10:10:00"), 10.0),
                   StatefulOps.Upd(2, ts("2024-01-01 10:00:00"), 2.0))
        q.processAllAvailable()
        val rows = spark.table("latest_out").as[StatefulOps.Change].collect()
          .sortBy(c => (c.key, c.ts.getTime))
        assert(rows.map(c => (c.key, c.ts, c.value)).toSeq == Seq(
          (1L, ts("2024-01-01 10:05:00"), 5.0),
          (1L, ts("2024-01-01 10:10:00"), 10.0),
          (2L, ts("2024-01-01 10:00:00"), 2.0)))
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming funnel equals the batch q83 funnel on real events, replayed in time order") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      // replay the real corpus in global event-time order, split into 3
      // micro-batches — the in-order arrival contract under which the
      // stream must reproduce the batch answer exactly
      import org.apache.spark.sql.functions.col
      val evs = graft.tables.Tables.events(spark, dir)
        .filter(col("event_type").isin("signup", "click", "purchase"))
        .orderBy(col("ts"), col("event_id"))
        .select(col("user_id"), col("ts"), col("event_type"))
        .as[StatefulOps.FunnelEv].collect()
      val in = MemoryStream[StatefulOps.FunnelEv]
      val q = StatefulOps.funnelStream(in.toDS(),
          Seq("signup", "click", "purchase"), java.time.Duration.ofHours(24))
        .writeStream.format("memory").queryName("funnel_diff_out")
        .outputMode(OutputMode.Append).start()
      try {
        evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
          in.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        // deepest level per user from the advance stream
        val streamed = spark.table("funnel_diff_out").as[StatefulOps.FunnelAdvance]
          .collect().groupBy(_.user_id).view.mapValues(_.map(_.level).max).toMap
        val streamLevelCounts = (1 to 3).map(l => l -> streamed.count(_._2 >= l)).toMap
        val batch = graft.ext.EventAnalytics.q83Funnel(spark, dir).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        (1 to 3).foreach { l =>
          assert(streamLevelCounts(l).toLong == batch(l),
            s"level $l: stream ${streamLevelCounts(l)} vs batch ${batch(l)}")
        }
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming funnel advances levels across micro-batches within the window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StatefulOps.FunnelEv]
      val q = StatefulOps.funnelStream(in.toDS(),
          Seq("signup", "click", "purchase"), java.time.Duration.ofHours(24))
        .writeStream.format("memory").queryName("funnel_out")
        .outputMode(OutputMode.Append).start()
      try {
        // batch 1: user 1 signs up then clicks (out of order in the batch
        // — fold sorts); user 2 clicks WITHOUT a signup (no level)
        in.addData(
          StatefulOps.FunnelEv(1, ts("2024-01-01 10:30:00"), "click"),
          StatefulOps.FunnelEv(1, ts("2024-01-01 10:00:00"), "signup"),
          StatefulOps.FunnelEv(2, ts("2024-01-01 09:00:00"), "click"))
        q.processAllAvailable()
        // batch 2: user 1 purchases (state carried: level 3); user 3
        // signs up; user 2's late signup does NOT resurrect the old click
        in.addData(
          StatefulOps.FunnelEv(1, ts("2024-01-01 11:00:00"), "purchase"),
          StatefulOps.FunnelEv(3, ts("2024-01-01 08:00:00"), "signup"),
          StatefulOps.FunnelEv(2, ts("2024-01-01 10:00:00"), "signup"))
        q.processAllAvailable()
        // batch 3: user 3's click is OUTSIDE the 24 h window → no advance;
        // a duplicate purchase for user 1 emits nothing
        in.addData(
          StatefulOps.FunnelEv(3, ts("2024-01-02 09:00:00"), "click"),
          StatefulOps.FunnelEv(1, ts("2024-01-01 11:00:00"), "purchase"))
        q.processAllAvailable()
        val rows = spark.table("funnel_out").as[StatefulOps.FunnelAdvance].collect()
          .sortBy(a => (a.user_id, a.level))
        assert(rows.map(a => (a.user_id, a.level, a.reached)).toSeq == Seq(
          (1L, 2, ts("2024-01-01 10:30:00")),   // deepest level of batch 1
          (1L, 3, ts("2024-01-01 11:00:00")),
          (2L, 1, ts("2024-01-01 10:00:00")),
          (3L, 1, ts("2024-01-01 08:00:00"))), s"got ${rows.toSeq}")
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

package graft.sources

import java.sql.Timestamp
import graft.SparkSpec
import graft.store.TraceStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The batch (`spark.read`) form of `graft-cdc` — the Delta
  * `table_changes` shape: options contract, feed schema with commit
  * metadata, pin-to-pin and pin-to-live diffs, and the no-side-effects
  * guarantee (a batch read never creates or drops snapshots). */
class CdcBatchSpec extends SparkSpec {

  private def mk(rows: (Int, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.map { case (sev, m, ty, t) =>
      (sev, m, "default", Timestamp.valueOf(t), ty, s"id$sev")
    }.toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
  }

  test("pin-to-pin read delivers the signed diff with the ending pin's commit metadata") {
    val store = tmpDir("cdcbatch")
    TraceStore.append(mk(
      (10, "m1", "ok", "2019-05-13 10:00:00"),
      (20, "m2", "bad", "2019-05-14 10:00:00")), store, splitsPerMonth = 2)
    val s1 = TraceStore.snapshot(store)
    TraceStore.append(mk((30, "m3", "ok", "2019-06-01 10:00:00")), store)
    TraceStore.deleteWhere(spark, store, col("Type") === "bad", splitsPerMonth = 1)
    val s2 = TraceStore.snapshot(store)

    val feed = spark.read.format("graft-cdc")
      .option("path", store)
      .option("startingSnapshot", s1)
      .option("endingSnapshot", s2)
      .load()
    val rows = feed.select("_change", "Severity", "_commit_snapshot").collect()
      .map((r: Row) => (r.getString(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(rows == Seq(("delete", 20, s2), ("insert", 30, s2)))
    // _commit_ts matches the ending manifest's install time, replay-stable
    val ts = feed.select("_commit_ts").distinct().collect().map(_.getTimestamp(0)).toSeq
    assert(ts == Seq(TraceStore.snapshotTimestamp(store, s2)))
    // a batch read leaves the snapshot set exactly as it found it
    assert(TraceStore.listSnapshots(store) == Seq(s1, s2))
  }

  test("omitting endingSnapshot diffs to the LIVE state with null commit metadata") {
    val store = tmpDir("cdcbatch-live")
    TraceStore.append(mk((10, "m1", "ok", "2019-05-13 10:00:00")), store)
    val s1 = TraceStore.snapshot(store)
    TraceStore.append(mk((20, "m2", "ok", "2019-06-01 10:00:00")), store)
    val rows = spark.read.format("graft-cdc")
      .option("path", store).option("startingSnapshot", s1).load()
      .select("_change", "Severity", "_commit_snapshot", "_commit_ts").collect()
      .map((r: Row) => (r.getString(0), r.getInt(1), r.getString(2), r.getTimestamp(3)))
    assert(rows.toSeq == Seq(("insert", 20, null, null)))
    assert(TraceStore.listSnapshots(store) == Seq(s1))
  }

  test("the relation's schema is the feed schema; Catalyst plans over it (filter + agg)") {
    val store = tmpDir("cdcbatch-plan")
    TraceStore.append(mk(
      (10, "m1", "ok", "2019-05-13 10:00:00"),
      (20, "m2", "bad", "2019-05-14 10:00:00")), store)
    val s1 = TraceStore.snapshot(store)
    TraceStore.append(mk((30, "m1", "ok", "2019-06-01 10:00:00"),
      (40, "m2", "ok", "2019-06-02 10:00:00")), store)
    val s2 = TraceStore.snapshot(store)
    val feed = spark.read.format("graft-cdc")
      .option("path", store).option("startingSnapshot", s1)
      .option("endingSnapshot", s2).load()
    assert(feed.schema == CdcStreamProvider.feedSchema(store))
    val agg = feed.filter(col("Machine") === "m1")
      .groupBy(col("_change")).agg(sum(col("Severity")).as("s"))
      .collect().map((r: Row) => (r.getString(0), r.getLong(1))).toSeq
    assert(agg == Seq(("insert", 30L)))
  }

  test("options contract: missing or malformed pins fail loudly") {
    val store = tmpDir("cdcbatch-opts")
    TraceStore.append(mk((10, "m1", "ok", "2019-05-13 10:00:00")), store)
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft-cdc").option("path", store).load()
    }
    assert(ex.getMessage.contains("startingSnapshot"))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-cdc").option("path", store)
        .option("startingSnapshot", "latest").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-cdc").option("path", store)
        .option("startingSnapshot", "s000001")
        .option("endingSnapshot", "nope").load()
    }
  }

  test("filter pushdown crosses the diff; pruning stays above it; _change filters stay with Spark") {
    val store = tmpDir("cdcbatch-push")
    TraceStore.append(mk(
      (10, "m1", "ok", "2019-05-13 10:00:00"),
      (20, "m2", "bad", "2019-05-14 10:00:00"),
      (30, "m1", "bad", "2019-06-01 10:00:00")), store, splitsPerMonth = 1)
    val s1 = TraceStore.snapshot(store)
    TraceStore.append(mk((40, "m1", "ok", "2019-07-01 10:00:00")), store)
    TraceStore.deleteWhere(spark, store, col("Type") === "bad", splitsPerMonth = 1)
    val s2 = TraceStore.snapshot(store)
    def feed = spark.read.format("graft-cdc")
      .option("path", store).option("startingSnapshot", s1)
      .option("endingSnapshot", s2).load()

    // a data-column filter (pushed below the diff into both sides)
    val m1 = feed.filter(col("Machine") === "m1")
      .select("_change", "Severity").collect()
      .map((r: Row) => (r.getString(0), r.getInt(1))).toSeq.sorted
    assert(m1 == Seq(("delete", 30), ("insert", 40)))
    // range + conjunction
    val hi = feed.filter(col("Severity") >= 25 && col("Machine").startsWith("m"))
      .select("_change", "Severity").collect()
      .map((r: Row) => (r.getString(0), r.getInt(1))).toSeq.sorted
    assert(hi == Seq(("delete", 20), ("delete", 30), ("insert", 40)).filter(_._2 >= 25))
    // a feed-metadata filter is NOT pushable — still exact via Spark
    val dels = feed.filter(col("_change") === "delete").count()
    assert(dels == 2L)
    // pruning above the diff: a single-column projection and a bare count
    assert(feed.select("Severity").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(20, 30, 40))
    assert(feed.count() == 3L)
  }

  test("the filter translator covers the common shapes and declines the rest") {
    import org.apache.spark.sql.sources._
    assert(CdcBatchRelation.translate(EqualTo("Machine", "m1")).isDefined)
    assert(CdcBatchRelation.translate(In("Severity", Array(1, 2))).isDefined)
    assert(CdcBatchRelation.translate(
      And(GreaterThan("Severity", 5), StringContains("Type", "o"))).isDefined)
    assert(CdcBatchRelation.translate(
      Or(IsNull("Type"), Not(LessThanOrEqual("Severity", 3)))).isDefined)
    // an untranslatable leaf poisons the whole conjunct — declined, and
    // Spark's re-application keeps the result exact
    assert(CdcBatchRelation.translate(
      And(EqualTo("Machine", "m1"), AlwaysTrue())).isEmpty)
  }

  test("pure-SQL surface: CREATE TEMPORARY VIEW ... USING graft-cdc") {
    val store = tmpDir("cdcbatch-sql")
    TraceStore.append(mk(
      (10, "m1", "ok", "2019-05-13 10:00:00"),
      (20, "m2", "bad", "2019-05-14 10:00:00")), store)
    val s1 = TraceStore.snapshot(store)
    TraceStore.deleteWhere(spark, store, col("Type") === "bad", splitsPerMonth = 1)
    val s2 = TraceStore.snapshot(store)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW store_changes
         |USING `graft-cdc`
         |OPTIONS (path '$store', startingSnapshot '$s1', endingSnapshot '$s2')
         |""".stripMargin)
    try {
      val rows = spark.sql(
        """SELECT _change, Severity, _commit_snapshot FROM store_changes
          |ORDER BY _change, Severity""".stripMargin).collect()
        .map((r: Row) => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
      assert(rows == Seq(("delete", 20, s2)))
      // SQL aggregation plans over the relation like any table
      val n = spark.sql(
        "SELECT count(*) FROM store_changes WHERE _change = 'delete'")
        .collect().head.getLong(0)
      assert(n == 1L)
    } finally spark.sql("DROP VIEW IF EXISTS store_changes")
  }

  test("a ym predicate prunes the changed-file WORKLIST: non-matching months are never opened") {
    // the behavioral pin: physically remove a non-matching month's
    // changed file. Metadata-level pruning never schedules it, so the
    // filtered read succeeds; if pruning regressed to row-filtering
    // only, readResolvedKeys would fail loudly on the missing file —
    // this test cannot pass by accident.
    import java.nio.file.{Files, Paths}
    val store = tmpDir("cdcbatch-prune")
    TraceStore.append(mk(
      (10, "m1", "ok", "2019-05-13 10:00:00"),
      (20, "m2", "ok", "2019-06-13 10:00:00")), store, splitsPerMonth = 1)
    val s1 = TraceStore.snapshot(store)
    TraceStore.append(mk(
      (30, "m1", "ok", "2019-05-20 10:00:00"),
      (40, "m2", "ok", "2019-06-20 10:00:00")), store, splitsPerMonth = 1)
    val s2 = TraceStore.snapshot(store)
    def feed = spark.read.format("graft-cdc")
      .option("path", store).option("startingSnapshot", s1)
      .option("endingSnapshot", s2).load()
    // sanity first, while all files exist: both months' inserts
    assert(feed.select("Severity").collect().map(_.getInt(0)).sorted.toSeq == Seq(30, 40))
    // poison June's CHANGED file (the s2-only key), then read only May
    val juneNew = (TraceStore.snapshotKeys(store, s2).toSet --
      TraceStore.snapshotKeys(store, s1).toSet).filter(_.startsWith("ym=201906"))
    assert(juneNew.size == 1, s"fixture drift: $juneNew")
    Files.delete(Paths.get(store).resolve(juneNew.head))
    val may = feed.filter(col("ym") === "201905")
      .select("_change", "Severity").collect()
      .map((r: Row) => (r.getString(0), r.getInt(1))).toSeq
    assert(may == Seq(("insert", 30)))
    // range and IN shapes prune the same way
    assert(feed.filter(col("ym") < "201906").select("Severity")
      .collect().map(_.getInt(0)).toSeq == Seq(30))
    assert(feed.filter(col("ym").isin("201905", "201904")).count() == 1L)
    // and the unfiltered read still fails loudly — the poison is real
    intercept[Exception] { feed.count() }
  }

  test("monthPredicate compiles ym-only conjuncts and refuses mixed or opaque ones") {
    import org.apache.spark.sql.sources._
    def p(fs: Filter*): Option[String => Boolean] =
      CdcBatchRelation.monthPredicate(fs.toArray)
    assert(p(EqualTo("ym", "201905")).get("201905"))
    assert(!p(EqualTo("ym", "201905")).get("201906"))
    assert(p(In("ym", Array("201905", "201907"))).get("201907"))
    assert(!p(GreaterThan("ym", "201906")).get("201906"))
    assert(p(GreaterThanOrEqual("ym", "201906")).get("201906"))
    assert(p(And(GreaterThan("ym", "201904"), LessThan("ym", "201906"))).get("201905"))
    assert(p(StringStartsWith("ym", "2019")).get("201912"))
    assert(p(IsNotNull("ym")).get("201905"))
    assert(!p(Not(EqualTo("ym", "201905"))).get("201905"))
    // several conjuncts: ALL must hold
    assert(!p(GreaterThan("ym", "201904"), LessThan("ym", "201905")).get("201905"))
    // a mixed disjunction can keep rows of ANY month — must not prune
    assert(p(Or(EqualTo("ym", "201905"), EqualTo("Machine", "m1"))).isEmpty)
    // a data-column filter alone never produces a month predicate
    assert(p(EqualTo("Machine", "m1")).isEmpty)
    // an opaque leaf inside a ym-only tree declines (structurally unevaluable)
    assert(p(AlwaysTrue()).isEmpty)
    // usable + unusable mix: the usable conjunct still prunes
    assert(!p(EqualTo("ym", "201905"), EqualTo("Machine", "m1")).get("201906"))
  }

  test("swapping the pins flips the signs (reconciliation algebra)") {
    val store = tmpDir("cdcbatch-swap")
    TraceStore.append(mk((10, "m1", "ok", "2019-05-13 10:00:00")), store)
    val s1 = TraceStore.snapshot(store)
    TraceStore.append(mk((20, "m2", "ok", "2019-06-01 10:00:00")), store)
    val s2 = TraceStore.snapshot(store)
    def changes(a: String, b: String): Seq[(String, Int)] =
      spark.read.format("graft-cdc").option("path", store)
        .option("startingSnapshot", a).option("endingSnapshot", b).load()
        .select("_change", "Severity").collect()
        .map((r: Row) => (r.getString(0), r.getInt(1))).toSeq.sorted
    assert(changes(s1, s2) == Seq(("insert", 20)))
    assert(changes(s2, s1) == Seq(("delete", 20)))
  }
}

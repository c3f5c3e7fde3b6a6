package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted fixtures for the frame-inventory (q168), bitmap-audience
  * (q169), and nested-rollup (q170) queries. */
class NewOpsSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("docs-newops")
    rows.toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def eventsDir(rows: Seq[(Long, Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("events-newops")
    rows.zipWithIndex
      .map { case ((u, t, ty), i) => (i.toLong, u, ty, 1.0, t) }
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q168: frame inventory matches stride arithmetic; short docs drop out") {
    // ASCII text, so octets == chars: 1600 B → 6 frames → sampled {0, 4};
    // 100 B → 0 frames → absent
    val dir = docsDir(Seq(
      (1L, "x" * 1600, "web", "en"),
      (2L, "y" * 100, "web", "en")))
    val rows = Multimodal.q168FrameInventory(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == 1L)            // media_id
    assert(r.getLong(1) == 2L)            // n_sampled: frames 0 and 4
    assert(r.getInt(2) == 4)              // last_idx
    assert(r.getLong(3) == 4L * 256)      // last_off
    assert(r.getLong(4) == 2L * 256)      // bytes_read
  }

  test("q169: bitmap audience matrix includes empty intersections") {
    val dir = eventsDir(Seq(
      (1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "a"), (2L, 2L, "a"), // dup (2,a)
      (2L, 3L, "b"), (3L, 3L, "b"), (4L, 3L, "b"),
      (9L, 5L, "c")))
    val got = SeriesStats.q169BitmapAudience(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got(("a", "b")) == ((3L, 3L, 2L, 4L, 0.5)))
    assert(got(("a", "c")) == ((3L, 1L, 0L, 4L, 0.0)))
    assert(got(("b", "c")) == ((3L, 1L, 0L, 4L, 0.0)))
  }

  test("q170: nested entries are sorted per source with exact counts") {
    val dir = docsDir(Seq(
      (1L, "t", "web", "en"), (2L, "t", "web", "de"), (3L, "t", "web", "en"),
      (4L, "t", "books", "fr")))
    val got = graft.queries.ExtendedQueries.q170NestedRollup(spark, dir).collect()
    assert(got.length == 2)
    val web = got.find(_.getString(0) == "web").get
    assert(web.getString(1) == "de:1,en:2")    // canonical lang-sorted serialization
    assert(web.getLong(2) == 3L)
  }
}

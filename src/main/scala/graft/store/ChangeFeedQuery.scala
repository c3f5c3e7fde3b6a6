package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** q226 — the rewrite-surviving change feed proven end to end through a
  * REAL store lifecycle, oracle-gated (the reference's whole framing is
  * CDC-ish ETL — /root/reference/trace-converter.py:66-72,
  * README.md:193-206 — and a CDC consumer must survive the sink's own
  * maintenance, not just clean appends).
  *
  * The fixture drives [[TraceStore.readChangesSince]] across BOTH
  * rewrite shapes [[TraceStore.readAppendedSince]] refuses:
  *
  *   1. append batch A (event_id % 3 == 0), pin snapshot s1  ← baseline
  *   2. append batch B (event_id % 3 == 1)                   ← inserts
  *   3. DELETE WHERE Type = 'error'                          ← erase:
  *      rewrites every matching month; A's erased rows must surface as
  *      deletes, B's erased rows must NEVER surface (inserted and
  *      erased within the window)
  *   4. compact()                                            ← rewrite:
  *      every multi-file month rewritten; must be INVISIBLE in the feed
  *
  * The graded read is the feed aggregated per (change, Machine); the
  * DuckDB oracle recomputes both sides from the raw events table, so an
  * over-report (compaction rows leaking as insert+delete pairs) or an
  * under-report (erased rows lost) fails the hash gate.
  *
  * Scale: the feed's cost is file-set pruning + EXCEPT ALL over only the
  * files touched since the snapshot (see readChangesSince) — the fixture
  * is small, the shape is the 100 TB one.
  */
object ChangeFeedQuery {

  private val built = new graft.util.SessionDirCache[(String, String)]

  /** events → trace-store rows; same closed-form mapping discipline as
    * [[EvolutionQuery.asTrace]] so the oracle reproduces every value
    * (shared with `tools/CdcProbe` so the probe's store shape can never
    * drift from the oracle-gated one). */
  private[graft] def asTrace(ev: DataFrame): DataFrame =
    ev.select(
      pmod(col("event_id"), lit(1000000000L)).cast(IntegerType).as("Severity"),
      concat(lit("m"), pmod(col("user_id"), lit(8L))).as("Machine"),
      col("event_type").as("LogGroup"),
      col("ts").cast(org.apache.spark.sql.types.TimestampType).as("Time"),
      col("event_type").as("Type"),
      col("event_id").cast("string").as("ID"))

  private def buildStore(s: SparkSession, dir: String): (String, String) =
    built(s, dir) { (sess, d) =>
      val path = graft.util.TmpDirs.scratch("graft-cdc-store")
      val ev = graft.tables.Tables.events(sess, d)
      val batch = pmod(col("event_id"), lit(3L))
      TraceStore.append(asTrace(ev.filter(batch === 0)), path, splitsPerMonth = 2)
      val snap = TraceStore.snapshot(path)
      TraceStore.append(asTrace(ev.filter(batch === 1)), path, splitsPerMonth = 2)
      TraceStore.deleteWhere(sess, path, col("Type") === "error", splitsPerMonth = 2)
      TraceStore.compact(sess, path, maxFilesPerMonth = 1, splitsPerMonth = 2)
      (path, snap)
    }

  /** q226: the feed since the pre-maintenance snapshot, aggregated.
    * Expected: inserts = batch B minus its erased rows; deletes = batch
    * A's erased rows; compaction contributes nothing. */
  def q226ChangeFeed(s: SparkSession, dir: String): DataFrame = {
    val (path, snap) = buildStore(s, dir)
    TraceStore.readChangesSince(s, path, snap)
      .groupBy(col("_change").as("change"), col("Machine"))
      .agg(count(lit(1)).as("n"), sum(col("Severity")).as("sum_sev"))
      .orderBy(col("change"), col("Machine"))
  }

  /** q227: CDC-DRIVEN incremental rollup maintenance — the change feed
    * applied to a pre-aggregated rollup: final = merge(rollup@snapshot,
    * +inserts, −deletes). Decomposable measures (count, sum) merge by
    * signed summation, so maintaining a 100 TB rollup across arbitrary
    * store maintenance costs one pass over the CHANGES — never a
    * re-aggregation of the accumulated table, and (unlike
    * [[TraceStream.upsertRollup]]'s append-only batches) it stays
    * correct across DELETE WHERE / retention, because deletes arrive as
    * negative increments. The oracle recomputes the final state from the
    * raw events table, so a sign error, a compaction leak (spurious
    * insert+delete pairs cancel — but only if BOTH sides arrive), or a
    * missed delete fails the hash gate. */
  def q227CdcRollup(s: SparkSession, dir: String): DataFrame = {
    val (path, snap) = buildStore(s, dir)
    val base = TraceStore.readSnapshot(s, path, snap)
      .groupBy(col("Machine"))
      .agg(count(lit(1)).as("n"), sum(col("Severity").cast("long")).as("sum_sev"))
    val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = TraceStore.readChangesSince(s, path, snap)
      .groupBy(col("Machine"))
      .agg(sum(sign).as("n"), sum(sign * col("Severity").cast("long")).as("sum_sev"))
    TraceStore.mergeRollups(base, delta, Seq("Machine"), Seq("n", "sum_sev"))
      .filter(col("n") > 0) // a fully-deleted group leaves the rollup
      .orderBy(col("Machine"))
  }

  val q227Sql: String =
    """SELECT 'm' || (user_id % 8) AS Machine, count(*) AS n,
      |  (sum(((event_id % 1000000000) + 1000000000) % 1000000000))::BIGINT AS sum_sev
      |FROM events
      |WHERE event_id % 3 IN (0, 1) AND event_type <> 'error'
      |GROUP BY 1 ORDER BY Machine""".stripMargin

  // DuckDB % keeps the dividend's sign — double-mod like q224's oracle
  val q226Sql: String =
    """SELECT chg AS change, Machine, count(*) AS n,
      |  (sum(((event_id % 1000000000) + 1000000000) % 1000000000))::BIGINT AS sum_sev
      |FROM (
      |  SELECT 'insert' AS chg, 'm' || (user_id % 8) AS Machine, event_id
      |  FROM events WHERE event_id % 3 = 1 AND event_type <> 'error'
      |  UNION ALL
      |  SELECT 'delete' AS chg, 'm' || (user_id % 8) AS Machine, event_id
      |  FROM events WHERE event_id % 3 = 0 AND event_type = 'error'
      |)
      |GROUP BY 1, 2 ORDER BY change, Machine""".stripMargin

  private val streamed = new graft.util.SessionDirCache[String]

  /** q228 — the change feed consumed through the ACTUAL `graft-cdc`
    * Structured Streaming source (graft.sources.CdcSource), end to end
    * and oracle-gated: the store lives through the same lifecycle as
    * q226 (append A → append B → DELETE WHERE → compact), but here each
    * mutation is delivered as its own MICRO-BATCH by a
    * Trigger.AvailableNow run resuming from the shared checkpoint — so
    * the gate pins, per batch id, exactly what the streaming offset
    * machinery delivered: batch 0 = the initial load (A as inserts,
    * `initialLoad=true`), batch 1 = B's inserts, batch 2 = the erased
    * rows as deletes, batch 3 = the compaction, which must cancel to
    * ZERO rows (it contributes no group). Every drain is also a restart
    * from the checkpointed offset, so offset replay is on the graded
    * path, not just in the spec.
    *
    * Scale: each micro-batch's plan scans only the files that changed
    * since its start offset (the same file-set pruning as q226); the
    * AvailableNow-between-mutations cadence is the documented
    * maintenance contract for a CDC reader. */
  def q228CdcStream(s: SparkSession, dir: String): DataFrame = {
    val out = streamed(s, dir) { (sess, d) =>
      val store = graft.util.TmpDirs.scratch("graft-cdcstream-store")
      val outDir = graft.util.TmpDirs.scratch("graft-cdcstream-out")
      val ck = graft.util.TmpDirs.scratch("graft-cdcstream-ck")
      val ev = graft.tables.Tables.events(sess, d)
      val batch = pmod(col("event_id"), lit(3L))
      val sink: (DataFrame, Long) => Unit = (bdf, bid) => {
        bdf.withColumn("_batch", lit(bid))
          .write.mode("append").parquet(outDir)
        ()
      }
      def drainOnce(): Unit = {
        val q = sess.readStream.format("graft-cdc")
          .option("path", store).option("initialLoad", "true")
          .load()
          .writeStream.option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch(sink)
          .start()
        q.awaitTermination()
      }
      TraceStore.append(asTrace(ev.filter(batch === 0)), store, splitsPerMonth = 2)
      drainOnce() // batch 0: initial load — A as inserts
      TraceStore.append(asTrace(ev.filter(batch === 1)), store, splitsPerMonth = 2)
      drainOnce() // batch 1: B as inserts
      TraceStore.deleteWhere(sess, store, col("Type") === "error", splitsPerMonth = 2)
      drainOnce() // batch 2: erased rows as deletes
      TraceStore.compact(sess, store, maxFilesPerMonth = 1, splitsPerMonth = 2)
      drainOnce() // batch 3: compaction — must cancel to zero rows
      outDir
    }
    s.read.parquet(out)
      .groupBy(col("_batch").as("batch"), col("_change").as("change"), col("Machine"))
      .agg(count(lit(1)).as("n"), sum(col("Severity").cast("long")).as("sum_sev"))
      .orderBy(col("batch"), col("change"), col("Machine"))
  }

  val q228Sql: String =
    """SELECT batch, chg AS change, Machine, count(*) AS n,
      |  (sum(((event_id % 1000000000) + 1000000000) % 1000000000))::BIGINT AS sum_sev
      |FROM (
      |  SELECT 0::BIGINT AS batch, 'insert' AS chg, 'm' || (user_id % 8) AS Machine, event_id
      |  FROM events WHERE event_id % 3 = 0
      |  UNION ALL
      |  SELECT 1::BIGINT, 'insert', 'm' || (user_id % 8), event_id
      |  FROM events WHERE event_id % 3 = 1
      |  UNION ALL
      |  SELECT 2::BIGINT, 'delete', 'm' || (user_id % 8), event_id
      |  FROM events WHERE event_id % 3 IN (0, 1) AND event_type = 'error'
      |)
      |GROUP BY 1, 2, 3 ORDER BY batch, change, Machine""".stripMargin

  def entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q226_change_feed", q226ChangeFeed _, Some(q226Sql)),
    ("q227_cdc_rollup",  q227CdcRollup _, Some(q227Sql)),
    ("q228_cdc_stream",  q228CdcStream _, Some(q228Sql)),
  )
}

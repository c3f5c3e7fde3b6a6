package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators (SURVEY.md §2 checklist "stateful
  * streaming ops"; C1/C6 in streaming form).
  *
  * State is partitioned by key and bounded by watermark/timeout, so the
  * state store grows with live keys only — the shape that holds on an
  * unbounded 100 TB/day stream.
  */
object StatefulOps {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              n: Long, sv: Double)

  /** Streaming exact dedup (C1): state bounded by the watermark horizon —
    * the streaming analogue of re-ingested trace files being tolerated by
    * the reference's at-least-once delivery (SURVEY §3 E1). */
  def dedupStream(df: DataFrame, tsCol: String, delay: String, keys: String*): DataFrame = {
    require(keys.nonEmpty,
      "dedupStream needs at least one key column (all-column dedup would " +
      "make every distinct-ts row unique — name the identity columns)")
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Streaming NEAR-dup suppression (C2 in streaming form): drops an
    * arriving document when a MinHash-similar one was already seen inside
    * the watermark horizon. The key is one LSH band (the first 4 of the
    * 16 minhash coordinates) — the AND-construction with a single band,
    * so suppression is precision-biased: 4 coordinates must all agree
    * (P ≈ jacc⁴ per doc pair, ≈ 2/3 at jacc 0.9; identical texts always
    * hit). Documents too short to shingle fall back to exact-text keys.
    * State is one key per live document, bounded by the watermark — this
    * is the ingest-time guard; corpus-wide resolution stays batch (q55). */
  def nearDupStream(docs: DataFrame, textCol: String, tsCol: String, delay: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sig = graft.functions.GraftFunctions.minhash_shingle_sig(col("__tk"))
    val bandKey = concat_ws(":",
      element_at(col("__sig"), 1), element_at(col("__sig"), 2),
      element_at(col("__sig"), 3), element_at(col("__sig"), 4))
    docs
      // null text must not key to null: dropDuplicates groups null keys
      // together and would silently discard all but one null-text doc
      .withColumn("__txt", coalesce(col(textCol), lit("")))
      .withColumn("__tk", split(col("__txt"), " "))
      .withColumn("__sig", when(size(col("__tk")) >= 3, sig).otherwise(lit(null)))
      .withColumn("__ndkey",
        when(col("__sig").isNotNull, bandKey).otherwise(concat(lit("raw:"), col("__txt"))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__ndkey")
      .drop("__txt", "__tk", "__sig", "__ndkey")
  }

  /** Stream-stream interval join (event correlation — click within a
    * window after its impression). Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark derives a state
    * retention horizon for each side: state holds only rows still inside
    * watermark + interval, never the full streams. Column names must be
    * disjoint (rename before calling). */
  def intervalJoin(lhs: DataFrame, rhs: DataFrame,
                   keyL: String, keyR: String, tsL: String, tsR: String,
                   delay: String, within: String): DataFrame = {
    import org.apache.spark.sql.functions._
    lhs.withWatermark(tsL, delay)
      .join(rhs.withWatermark(tsR, delay),
        col(keyL) === col(keyR) &&
        col(tsL) >= col(tsR) &&
        col(tsL) <= col(tsR) + expr(s"interval $within"))
  }

  /** Custom gap-based sessionization with explicit state
    * (flatMapGroupsWithState): emits a session when the gap closes it or
    * the event-time timeout fires. The built-in session_window (q23) covers
    * the aggregate case; this is the arbitrary-state escape hatch.
    *
    * Out-of-order handling: an event inside the live session's gap
    * envelope [start − gap, last + gap] merges with min/max bounds (a late
    * arrival must never move `last` backwards — that would shrink the
    * timeout horizon — nor leave `start` later than the session's earliest
    * event). Events older than start − gap form distinct earlier
    * sessions: they are gap-grouped among THEMSELVES within the batch
    * (two late events 5 s apart are one 2-event session, not two
    * singletons) and emitted closed. Pre-session events split across
    * DIFFERENT micro-batches still emit separately — merging those would
    * need unbounded closed-session state; the documented trade.
    * `delay` is the late-data watermark, a caller knob like dedupStream's. */
  def sessionize(ds: Dataset[Ev], gapMinutes: Int,
                 delay: String = "10 seconds"): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(key: Long, events: Iterator[Ev],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      if (state.hasTimedOut) {
        val s = state.get
        out ::= SessionOut(key, new Timestamp(s.start), s.n, s.sum)
        state.remove()
      } else {
        val evs = events.toSeq.sortBy(_.ts.getTime)
        var st = state.getOption
        // pre-session events (older than the live envelope) gap-group
        // among themselves instead of each emitting a singleton
        var pre: Option[SessionState] = None
        def closePre(): Unit = pre.foreach { p =>
          out ::= SessionOut(key, new Timestamp(p.start), p.n, p.sum)
          pre = None
        }
        evs.foreach { e =>
          val t = e.ts.getTime
          st match {
            case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
              st = Some(s.copy(start = math.min(s.start, t),
                last = math.max(s.last, t), n = s.n + 1, sum = s.sum + e.value))
            case Some(s) if t > s.last + gapMs =>
              closePre()
              out ::= SessionOut(key, new Timestamp(s.start), s.n, s.sum)
              st = Some(SessionState(t, t, 1, e.value))
            case Some(_) => // t < start − gap: an earlier, already-closed session
              pre match {
                case Some(p) if t - p.last <= gapMs =>
                  pre = Some(p.copy(last = math.max(p.last, t), n = p.n + 1,
                    sum = p.sum + e.value))
                case _ =>
                  closePre()
                  pre = Some(SessionState(t, t, 1, e.value))
              }
            case None =>
              st = Some(SessionState(t, t, 1, e.value))
          }
        }
        closePre()
        st.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
      }
      out.reverseIterator
    }

    ds.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  final case class Upd(key: Long, ts: Timestamp, value: Double)
  final case class CurState(ts: Long, v: Double)
  final case class Change(key: Long, ts: Timestamp, value: Double)

  /** Newest-wins CDC upsert processor: emits a change row only when an
    * arriving event advances its key's current state — stale out-of-order
    * arrivals and duplicate deliveries are absorbed silently. Ordering is
    * lexicographic (ts, value); the stream carries no event id, so for
    * keys whose updates have distinct timestamps the final state equals
    * the batch q87_latest_state answer regardless of arrival order
    * (q87 breaks exact-timestamp ties by event_id instead — feed a
    * (ts, seq) composite as the timestamp if that tie-break matters). */
  final class LatestStateProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Upd, Change] {
    @transient private var cur: ValueState[CurState] = _
    private val ttlOn = ttl != TTLConfig.NONE

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[CurState]("cur", Encoders.product[CurState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Upd],
        timers: TimerValues): Iterator[Change] = {
      val out = scala.collection.mutable.ListBuffer.empty[Change]
      // one store read before the fold, one write after — ValueState
      // accesses are RocksDB round-trips, the per-row hot path stays on a
      // local var
      var st: Option[CurState] = if (cur.exists()) Some(cur.get()) else None
      val st0 = st
      // fold in event-time order so within-batch emits are deterministic
      rows.toSeq.sortBy(u => (u.ts.getTime, u.value)).foreach { u =>
        val t = u.ts.getTime
        val newer = st.forall(c => t > c.ts || (t == c.ts && u.value > c.v))
        if (newer) {
          st = Some(CurState(t, u.value))
          out += Change(key, u.ts, u.value)
        }
      }
      // TTL measures from the last WRITE: a key whose traffic is all
      // duplicates/stale must still refresh, or it expires mid-traffic
      // and a later replayed older update regresses the newest-wins view
      if (st != st0 || (ttlOn && st.isDefined)) st.foreach(cur.update)
      out.iterator
    }
  }

  final case class TypedUser(event_type: String, user_id: Long)
  final case class DistinctEst(event_type: String, est_users: Long, n_batch_rows: Long)

  /** Streaming per-key distinct-cardinality maintenance with HLL sketch
    * state — the streaming member of the mergeable-sketch family (q39
    * batch HLL, q186 union-of-states rollup): state per key is ONE
    * datasketches HLL blob (≤ ~2^lgK bytes, constant in stream length),
    * so running "distinct users per event type" on an unbounded stream
    * never stores the user set. Each micro-batch folds its rows into the
    * sketch locally (one state read + one write per key per batch) and
    * emits the updated estimate. HLL is exact in sparse mode, so at test
    * cardinalities estimates ARE the exact counts; at scale the q39
    * error contract applies. */
  final class DistinctSketchProcessor(lgK: Int)
      extends StatefulProcessor[String, TypedUser, DistinctEst] {
    @transient private var sk: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[Array[Byte]]("hll", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedUser],
        timers: TimerValues): Iterator[DistinctEst] = {
      import org.apache.datasketches.hll.HllSketch
      val cur =
        if (sk.exists()) HllSketch.heapify(sk.get()) else new HllSketch(lgK)
      var n = 0L
      rows.foreach { r => cur.update(r.user_id); n += 1 }
      sk.update(cur.toUpdatableByteArray)
      Iterator.single(DistinctEst(key, math.rint(cur.getEstimate).toLong, n))
    }
  }

  /** Per-event-type running distinct users over a stream (RocksDB state
    * store required, as for [[latestStateStream]]). */
  def distinctUsersStream(ds: Dataset[TypedUser], lgK: Int = 12): Dataset[DistinctEst] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .transformWithState(new DistinctSketchProcessor(lgK),
        TimeMode.None(), OutputMode.Append)
  }

  final case class KeyedTok(key: String, tok: String)
  final case class HeavyHitters(key: String, top: Seq[String], n_tracked: Long)

  /** Streaming heavy hitters — the Misra-Gries twin of
    * [[distinctUsersStream]] (batch analogue: q69): per-key state is the
    * k-bounded MG counter map, folded locally per micro-batch with the
    * SAME reduce step as the batch Aggregator (`FreqSketch.FreqAgg`), so
    * the batch guarantee carries over: any token with true frequency
    * > n/(k+1) of the stream-so-far is present. Emits the current
    * count-desc top list per batch. State is ≤ k (token, count) entries
    * per key — constant however long the stream runs. */
  final class HeavyHitterProcessor(k: Int)
      extends StatefulProcessor[String, KeyedTok, HeavyHitters] {
    @transient private var st: ValueState[Map[String, Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Map[String, Long]]("mg",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]](),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedTok],
        timers: TimerValues): Iterator[HeavyHitters] = {
      val agg = new graft.functions.FreqSketch.FreqAgg(k)
      val buf = graft.functions.FreqSketch.Buf(
        scala.collection.mutable.HashMap.from(
          if (st.exists()) st.get() else Map.empty[String, Long]))
      rows.foreach(r => agg.reduce(buf, r.tok))
      st.update(buf.counters.toMap)
      val top = agg.finish(buf).map(_._1)
      Iterator.single(HeavyHitters(key, top, buf.counters.size.toLong))
    }
  }

  /** Per-key streaming top tokens with k=`capacity` MG counters. */
  def heavyHittersStream(ds: Dataset[KeyedTok], capacity: Int = 16): Dataset[HeavyHitters] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new HeavyHitterProcessor(capacity),
        TimeMode.None(), OutputMode.Append)
  }

  final case class FunnelEv(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelAdvance(user_id: Long, level: Int, reached: Timestamp)
  // level-completion times in µs; Long.MinValue = level not reached
  final case class FunnelSt(times: Seq[Long])

  /** Streaming windowFunnel — the q83 batch funnel's greedy state machine
    * run incrementally: per user, t(0) = first step-0 event ever, t(i) =
    * first step-i event with t > t(i−1) and t ≤ t(0)+window. State is one
    * |steps|-slot time vector per user (constant bytes however long the
    * stream runs — never the event list the batch fold buffers). Emits
    * ONE row per micro-batch when a user's deepest completed level
    * advances — intermediate levels crossed within the same batch are
    * implied, not separately emitted — so the funnel report is
    * per-user max(level), then count(level ≥ l) per step (what the
    * differential spec computes); a naive groupBy(level).count over the
    * raw advance rows would undercount levels skipped within a batch.
    *
    * Matches the batch q83 answer exactly when each user's events arrive
    * in event-time order ACROSS micro-batches (within a batch the fold
    * sorts); a cross-batch late event may be skipped by the greedy
    * machine where the batch sort would have used it — the standard
    * streaming trade, same caveat as [[LatestStateProcessor]]'s
    * tie-break note. */
  final class FunnelProcessor(steps: IndexedSeq[String], windowUs: Long)
      extends StatefulProcessor[Long, FunnelEv, FunnelAdvance] {
    @transient private var st: ValueState[FunnelSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelSt]("funnel", Encoders.product[FunnelSt],
        TTLConfig.NONE)

    private def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000

    override def handleInputRows(key: Long, rows: Iterator[FunnelEv],
        timers: TimerValues): Iterator[FunnelAdvance] = {
      val t = (if (st.exists()) st.get().times
               else Seq.fill(steps.length)(Long.MinValue)).toArray
      val depth0 = t.lastIndexWhere(_ != Long.MinValue)
      // fold in event-time order so within-batch behavior matches the
      // batch fold's array_sort
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
        val sIdx = steps.indexOf(e.event_type)
        val tm = micros(e.ts)
        if (sIdx == 0 && t(0) == Long.MinValue) t(0) = tm
        else if (sIdx > 0 && t(sIdx) == Long.MinValue && t(sIdx - 1) != Long.MinValue &&
                 tm > t(sIdx - 1) && tm <= t(0) + windowUs) t(sIdx) = tm
      }
      // slots only fill when their predecessor is set, so any state
      // change strictly deepens the funnel — one emit per advance
      val depth = t.lastIndexWhere(_ != Long.MinValue)
      if (depth > depth0) {
        st.update(FunnelSt(t.toSeq))
        // preserve sub-millisecond precision: state is in µs, and a
        // ms-truncated Timestamp would mismatch the batch q83's epoch-µs
        val us = t(depth)
        val ts = new Timestamp(Math.floorDiv(us, 1000L))
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        Iterator.single(FunnelAdvance(key, depth + 1, ts))
      } else Iterator.empty
    }
  }

  /** Per-user streaming funnel over `steps` within `window` of the first
    * step (RocksDB state store required, as for [[latestStateStream]]). */
  def funnelStream(ds: Dataset[FunnelEv], steps: Seq[String],
      window: java.time.Duration): Dataset[FunnelAdvance] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(steps.toIndexedSeq, window.toNanos / 1000L),
        TimeMode.None(), OutputMode.Append)
  }

  /** Streaming latest-state maintenance (ReplacingMergeTree / CDC upsert,
    * the q87 batch query in streaming form) on Spark 4's
    * `transformWithState` + RocksDB state store. State is exactly one
    * `CurState` per live key; `ttl` retires keys idle longer than the
    * retention horizon, which is what bounds the store on an unbounded
    * key space (the 100 TB/day shape). Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider` (transformWithState does not run
    * on the HDFS-backed provider). */
  def latestStateStream(ds: Dataset[Upd],
      ttl: Option[java.time.Duration] = None): Dataset[Change] = {
    import ds.sparkSession.implicits._
    // TimeMode.None unless TTL is requested: ProcessingTime makes the
    // engine self-trigger empty micro-batches to advance time (needed for
    // TTL expiry, pure overhead otherwise — and processAllAvailable never
    // goes idle under it).
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(
        new LatestStateProcessor(ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)),
        mode, OutputMode.Append)
  }
}

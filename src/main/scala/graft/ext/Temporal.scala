package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Temporal operators Spark has no single built-in for: as-of join, interval
  * (range) join, gap-based sessionization (SURVEY.md §2 joins row + C6).
  *
  * The as-of join is expressed as a window scan rather than a point lookup:
  * shuffle once on the partition key, sort within partitions by time, and
  * carry the last matching right-side value forward. That is O(n log n) per
  * key with no per-row probing — the formulation that survives 100 TB,
  * unlike a correlated subquery (which is what the DuckDB oracle uses,
  * correct but quadratic).
  */
object Temporal {

  /** Generic as-of lookup within one stream: for every `probe`-typed row,
    * the greatest `ref`-typed timestamp of the same key strictly before it.
    * rowsBetween(-∞, -1) + orderBy(ts) ≡ "latest ref with ref.ts < probe.ts"
    * given unique timestamps per key.
    */
  def asOfLast(df: DataFrame, keyCol: String, tsCol: String,
               isRef: Column, refValue: Column): DataFrame = {
    // Tiebreak: at equal timestamps probe rows sort BEFORE ref rows, so
    // the strictly-preceding frame never sees a simultaneous ref — exact
    // "ref.ts < probe.ts" semantics even with duplicate timestamps
    // (max() over the refs is order-independent, so this is fully
    // deterministic).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), isRef.cast("int"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__asof", max(when(isRef, refValue)).over(w))
  }

  // ------------------------------------------------------------------ as-of
  /** For each error event: the most recent click by the same user strictly
    * before it. One shuffle on user_id; no self-join.
    */
  def q21AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("error", "click"))
    asOfLast(ev, "user_id", "ts",
             col("event_type") === "click", col("ts"))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"),
              col("__asof").as("prev_click_ts"))
      .orderBy(col("event_id"))
  }

  val q21Sql: String =
    """SELECT e.event_id, e.user_id, e.ts,
      |  (SELECT max(c.ts) FROM events c
      |   WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts < e.ts) AS prev_click_ts
      |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin

  // ------------------------------------------------------------------ range join
  /** Interval join: purchases within 24 h after a signup by the same user.
    * The equi-key (user_id) makes this a shuffled hash/sort-merge join with
    * the range predicate as a post-filter — NOT a broadcast-nested-loop.
    * At 100 TB, bucketing both sides by user_id removes even that shuffle.
    */
  def q22RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val su = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("signup_ts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
              col("ts").as("purchase_ts"), col("value"))
    su.join(pu,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("signup_id"), col("purchase_id"), col("user_id"),
              col("signup_ts"), col("purchase_ts"), col("value"))
      .orderBy(col("signup_id"), col("purchase_id"))
  }

  val q22Sql: String =
    """SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id,
      |  s.ts AS signup_ts, p.ts AS purchase_ts, p.value
      |FROM events s JOIN events p
      |  ON s.user_id = p.user_id AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOURS
      |WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
      |ORDER BY signup_id, purchase_id""".stripMargin

  // ------------------------------------------------------------------ sessionize
  /** Gap-based sessionization (30-minute inactivity gap) using the built-in
    * session_window operator — the exact same operator drives the streaming
    * rollup path with watermarks. Single shuffle on (user_id).
    */
  def q23Sessionize(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"),
           min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n"), col("sv"))
      .orderBy(col("user_id"), col("session_start"))

  val q23Sql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTES
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n, round(sum(value), 2) AS sv
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Same semantics as q21 through the native merge-based physical
    * operator (graft.plans.AsOfJoinExec): one forward pass per
    * co-partition, O(1) state — vs the window formulation's per-key
    * buffering. Oracle: identical to q21's. */
  def q51AsOfNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin(errors, clicks, "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
              col("c_ts").as("prev_click_ts"))
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------------------ interval-overlap join
  /** Interval×interval overlap join (two interval SETS, vs q22's
    * point-in-window): each user's daily activity span [first event, last
    * event] against that day's error-incident window [first error, last
    * error], emitting the overlap duration. The day equi-key makes this a
    * hash join with the overlap condition as a residual filter — never a
    * nested-loop over all interval pairs — and banding by day also bounds
    * each interval to its band, the standard decomposition for interval
    * joins at scale (multi-day intervals would be exploded per covered
    * day and de-overlapped after). The incident side is calendar-sized,
    * hence broadcast. Overlap arithmetic is integer microseconds. */
  def q105IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"), unix_micros(col("ts")).as("tus"))
    val spans = ev.groupBy(col("user_id"), col("day"))
      .agg(min(col("tus")).as("lo"), max(col("tus")).as("hi"))
    val incidents = ev.filter(col("event_type") === "error")
      .groupBy(col("day"))
      .agg(min(col("tus")).as("elo"), max(col("tus")).as("ehi"))
    spans.join(broadcast(incidents), Seq("day"))
      .filter(col("lo") <= col("ehi") && col("elo") <= col("hi"))
      .select(col("user_id"), col("day"),
        (least(col("hi"), col("ehi")) - greatest(col("lo"), col("elo")))
          .as("overlap_us"))
      .orderBy(col("user_id"), col("day"))
  }

  val q105Sql: String =
    """WITH ev AS (SELECT user_id, event_type, date_trunc('day', ts) AS day,
      |              epoch_us(ts) AS tus FROM events),
      |spans AS (SELECT user_id, day, min(tus) AS lo, max(tus) AS hi
      |          FROM ev GROUP BY user_id, day),
      |inc AS (SELECT day, min(tus) AS elo, max(tus) AS ehi
      |        FROM ev WHERE event_type = 'error' GROUP BY day)
      |SELECT s.user_id, s.day,
      |       (least(s.hi, i.ehi) - greatest(s.lo, i.elo))::BIGINT AS overlap_us
      |FROM spans s JOIN inc i USING (day)
      |WHERE s.lo <= i.ehi AND i.elo <= s.hi
      |ORDER BY s.user_id, s.day""".stripMargin

  // ---------------------------------------------------------------- q120: keyless interval join via optimizer rule
  /** Keyless point-in-interval join written NAIVELY — purchases landing
    * inside each day's 2-hour incident window (window = first error of
    * the day + 2h; no shared key between the sides) — and left to the
    * [[graft.plans.RangeBandRewrite]] optimizer rule to plan: the rule
    * bands the window into hour buckets and turns the would-be
    * BroadcastNestedLoopJoin into a hash equi-join (RangeBandSpec pins
    * the plan shape; this query pins the semantics through the DuckDB
    * gate). The declarative query stays a plain theta join — the
    * optimization lives in the engine, not the query. */
  def q120RangeBandRule(s: SparkSession, dir: String): DataFrame = {
    // The band width is a SESSION conf the rule reads at optimization
    // time. Setting/restoring it on the caller's session leaks the
    // rewrite into any query another thread optimizes concurrently (and
    // the restore can clobber a width that thread set) — same hazard
    // class as the events reader confs, same fix: a derived session
    // (shared SparkContext, isolated SQLConf) that carries the caller's
    // modifiable confs plus the band width, for this query only.
    val c = graft.util.Sessions.derived(s)
    graft.plans.RangeBandRewrite.install(c)
    c.conf.set(graft.plans.RangeBandRewrite.ConfKey, "3600")
    val ev = Tables.events(c, dir)
    val inc = ev.filter(col("event_type") === "error")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(min(col("ts")).as("w_start"))
      .withColumn("w_end", col("w_start") + expr("INTERVAL 2 HOURS"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("ts"), col("value"))
    pur.join(inc, col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .groupBy(col("day"), col("w_start"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("day"))
  }

  val q120Sql: String =
    """WITH inc AS (SELECT date_trunc('day', ts) AS day, min(ts) AS w_start
      |             FROM events WHERE event_type = 'error' GROUP BY 1),
      |p AS (SELECT ts, value FROM events WHERE event_type = 'purchase')
      |SELECT i.day, i.w_start, count(*) AS n, round(avg(p.value), 4) AS avg_value
      |FROM p JOIN inc i
      |  ON p.ts >= i.w_start AND p.ts <= i.w_start + INTERVAL 2 HOUR
      |GROUP BY 1, 2 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q126: session statistics
  /** Corpus-level session statistics on top of q23's 30-minute session
    * windows: session count, average events per session, average and
    * maximum session duration. The same one-shuffle session_window
    * aggregation produces the per-session table (entity-grain); the
    * stats pass is a single global aggregate over it. Durations are
    * exact µs integers (zero for singleton sessions); the only float is
    * the final rounded division. */
  def q126SessionStats(s: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
    sess.agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        round(sum(col("n")).cast("double") / count(lit(1)), 4).as("avg_events"),
        round(sum(col("dur_us")).cast("double") / count(lit(1)) / 1e6, 4).as("avg_dur_s"),
        round(max(col("dur_us")).cast("double") / 1e6, 4).as("max_dur_s"))
  }

  val q126Sql: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTES
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sid, count(*) AS n,
      |         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      |  FROM s GROUP BY user_id, sid)
      |SELECT count(*) AS n_sessions,
      |       CAST(sum(n) AS BIGINT) AS n_events,
      |       round(sum(n)::DOUBLE / count(*), 4) AS avg_events,
      |       round(sum(dur_us)::DOUBLE / count(*) / 1e6, 4) AS avg_dur_s,
      |       round(max(dur_us)::DOUBLE / 1e6, 4) AS max_dur_s
      |FROM sess""".stripMargin

  // ---------------------------------------------------------------- q136: interval union length
  /** Union length of overlapping intervals (ClickHouse
    * `intervalLengthSum`): each click opens a 1-hour engagement window;
    * overlapping windows must be counted once, so per user the merged-
    * island total is the real "engaged time". Islands form with the
    * cumulative-max sweep (start > max(end) of everything before ⇒ new
    * island) — one user-keyed sort, exact µs integers end to end, zero
    * floats. The same sweep q23's oracle uses for session islands. */
  def q136EngagedTime(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + 3600000000L).as("en"))
      .withColumn("prev_max_en", max(col("en")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg((max(col("en")) - min(col("st"))).as("len_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("len_us")).as("sl"))
      .select(col("user_id"), col("n_islands"),
        expr("sl DIV 1000000").as("engaged_s"))
      .orderBy(col("user_id"))
  }

  val q136Sql: String =
    """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS st,
      |                  epoch_us(ts) + 3600000000 AS en
      |           FROM events WHERE event_type = 'click'),
      |m AS (SELECT user_id, event_id, st, en,
      |             max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |               AS prev_max_en
      |      FROM c),
      |i AS (SELECT user_id, st, en,
      |             sum(CASE WHEN prev_max_en IS NULL OR st > prev_max_en
      |                      THEN 1 ELSE 0 END)
      |               OVER (PARTITION BY user_id ORDER BY st, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS island
      |      FROM m),
      |isl AS (SELECT user_id, island, max(en) - min(st) AS len_us
      |        FROM i GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_islands,
      |       CAST(CAST(sum(len_us) AS BIGINT) // 1000000 AS BIGINT) AS engaged_s
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------ as-of with tolerance
  /** As-of join with a staleness bound: the latest prior click within 10
    * minutes, else NULL — the "don't join stale context" variant every
    * feature-store lookup needs (an unbounded as-of happily attaches an
    * hours-old row). Same single user-keyed window pass as q21: the
    * unbounded latest-prior ref is THE within-tolerance answer whenever
    * it is fresh enough, and when it is too old no earlier ref can be
    * fresher — so the bound is a row-local post-filter, not a second
    * scan or a range join. O(1) window state at any scale. */
  def q148AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("error", "click"))
    asOfLast(ev, "user_id", "ts",
             col("event_type") === "click", col("ts"))
      .filter(col("event_type") === "error")
      .withColumn("prev_click_ts",
        when(col("__asof") >= col("ts") - expr("INTERVAL 10 MINUTES"), col("__asof")))
      .select(col("event_id"), col("user_id"), col("ts"), col("prev_click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("prev_click_ts"))).as("age_us"))
      .orderBy(col("event_id"))
  }

  val q148Sql: String =
    """WITH j AS (
      |  SELECT e.event_id, e.user_id, e.ts,
      |    (SELECT max(c.ts) FROM events c
      |     WHERE c.user_id = e.user_id AND c.event_type = 'click'
      |       AND c.ts < e.ts AND c.ts >= e.ts - INTERVAL 10 MINUTES) AS prev_click_ts
      |  FROM events e WHERE e.event_type = 'error')
      |SELECT event_id, user_id, ts, prev_click_ts,
      |       epoch_us(ts) - epoch_us(prev_click_ts) AS age_us
      |FROM j ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ within-session funnel
  /** Session-scoped conversion: did the signup→purchase sequence complete
    * INSIDE one session (30-minute gaps), rather than anywhere in the
    * user's history (q86's scope)? The product-analytics composition of
    * two operators this engine already proves separately — built-in
    * session_window assignment + the ordered type-string test — in one
    * user-keyed shuffle. Session grain keeps per-group state bounded by
    * session length, not user history. Oracle builds identical sessions
    * via the lag-gap island method (the equivalence session_window ↔
    * islands is what q23's gate established). */
  def q160SessionFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        array_join(transform(array_sort(collect_list(
          struct(col("ts"), col("event_id"), substring(col("event_type"), 1, 1).as("c")))),
          x => x.getField("c")), "").as("seq"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        when(col("seq").rlike("s[^e]*p"), lit(1)).otherwise(lit(0)).as("converted"))
      .orderBy(col("user_id"), col("session_start"))

  val q160Sql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTES
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
      |       CASE WHEN regexp_matches(
      |              string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
      |              's[^e]*p') THEN 1 ELSE 0 END AS converted
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q21_asof_join",  q21AsOfJoin _,  Some(q21Sql)),
    ("q51_asof_native", q51AsOfNative _, Some(q21Sql)),
    ("q22_range_join", q22RangeJoin _, Some(q22Sql)),
    ("q23_sessionize", q23Sessionize _, Some(q23Sql)),
    ("q105_interval_overlap", q105IntervalOverlap _, Some(q105Sql)),
    ("q120_range_band_rule",  q120RangeBandRule _,   Some(q120Sql)),
    ("q126_session_stats",    q126SessionStats _,    Some(q126Sql)),
    ("q136_engaged_time",     q136EngagedTime _,     Some(q136Sql)),
    ("q148_asof_tolerance",   q148AsofTolerance _,   Some(q148Sql)),
    ("q160_session_funnel",   q160SessionFunnel _,   Some(q160Sql)),
  )
}

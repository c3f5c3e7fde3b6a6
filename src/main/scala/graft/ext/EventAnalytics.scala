package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Event-analytics operators over the events stream table — the ClickHouse
  * analytics-function family the reference's sink engine ships natively
  * (`WITH FILL`, `windowFunnel`, `retention`; the reference delegates all
  * querying to ClickHouse, README.md:9-10, so "same query capabilities"
  * includes these), re-expressed as declarative Spark plans.
  *
  * Scale design: every operator aggregates per user/hour FIRST (shuffle
  * keyed on the entity, partial aggregation map-side), then works on the
  * entity-level table — never on raw events twice. Genuinely bounded
  * sides (hour spine, scalar bounds/counts) are broadcast; entity-sized
  * sides (the retention cohort) shuffle on their already-partitioned key.
  */
object EventAnalytics {

  // ---------------------------------------------------------------- gap-filled time series (WITH FILL)
  /** Hourly counts of one event type with EVERY hour of the observed range
    * present — missing hours filled with 0 (ClickHouse `ORDER BY … WITH
    * FILL STEP`). The hour spine is generated from the aggregated bounds
    * (two scalar values), so the fill costs one tiny explode + left join
    * against the already-aggregated hourly counts — raw events are
    * scanned once. Gap-free series are what rate/rolling computations
    * downstream (q68-style) assume. */
  def q82GapFill(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      // hour-cardinality table, eagerly materialized: the spine bounds
      // derive from it rather than re-scanning raw events — one raw scan
      .localCheckpoint(true)
    // the spine bounds are two O(1) scalars over the hour-cardinality
    // table — collect them rather than wiring a subquery branch into the
    // plan (one less sequential AQE stage; the spine explode runs over
    // two literals)
    val b = counts.agg(min(col("h")).as("lo"), max(col("h")).as("hi")).collect()(0)
    if (b.isNullAt(0)) return counts.limit(0)
    val spine = s.range(1)
      .select(explode(sequence(lit(b.getTimestamp(0)), lit(b.getTimestamp(1)),
        expr("interval 1 hour"))).as("h"))
    spine.join(counts, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("h"))
  }

  val q82Sql: String =
    """WITH ev AS (SELECT date_trunc('hour', ts) AS h FROM events
      |            WHERE event_type = 'purchase'),
      |counts AS (SELECT h, count(*) AS n FROM ev GROUP BY h),
      |spine AS (SELECT unnest(generate_series((SELECT min(h) FROM ev),
      |                                        (SELECT max(h) FROM ev),
      |                                        INTERVAL 1 HOUR)) AS h)
      |SELECT s.h, coalesce(c.n, 0) AS n
      |FROM spine s LEFT JOIN counts c USING (h)
      |ORDER BY s.h""".stripMargin

  // ---------------------------------------------------------------- linear interpolation fill (WITH FILL INTERPOLATE)
  /** Gap filling by LINEAR INTERPOLATION (ClickHouse `WITH FILL …
    * INTERPOLATE`), completing the fill family: q82 zero-fills counts,
    * q138 carries the last value (LOCF), this draws the line between the
    * neighboring known values — the right semantics for sampled gauges.
    * v(h) = prev + (next − prev)·(h − prev_h)/(next_h − prev_h) with
    * integer hour positions; hours outside the known range stay NULL
    * (nothing to interpolate toward). The spine is calendar-sized and
    * derives from the aggregated hourly table — one raw scan; the
    * carry/lookahead windows run over spine rows only, the q82/q138
    * scale contract. */
  def q157Interpolate(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value")).as("v"))
      .localCheckpoint(true)
    val b = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi")).collect()(0)
    // empty slice keeps the normal (h, v_interp, interpolated) schema
    // (q138's bug class — hourly.limit(0) would surface (h, v) instead)
    if (b.isNullAt(0))
      return hourly.limit(0).select(col("h"),
        lit(null).cast("double").as("v_interp"), lit(true).as("interpolated"))
    val spine = s.range(1)
      .select(explode(sequence(lit(b.getTimestamp(0)), lit(b.getTimestamp(1)),
        expr("interval 1 hour"))).as("h"))
    val joined = spine.join(hourly, Seq("h"), "left")
      .withColumn("pos", expr("unix_micros(h) DIV 3600000000"))
    val wb = Window.orderBy(col("pos")).rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.orderBy(col("pos")).rowsBetween(0, Window.unboundedFollowing)
    joined
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("pp", last(when(col("v").isNotNull, col("pos")), ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("np", first(when(col("v").isNotNull, col("pos")), ignoreNulls = true).over(wf))
      .withColumn("v_interp",
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("pos") - col("pp")).cast("double") / (col("np") - col("pp")).cast("double")))
      .select(col("h"), round(col("v_interp"), 3).as("v_interp"),
        col("v").isNull.as("interpolated"))
      .orderBy(col("h"))
  }

  val q157Sql: String =
    """WITH ev AS (SELECT date_trunc('hour', ts) AS h, value FROM events
      |            WHERE event_type = 'error'),
      |hourly AS (SELECT h, sum(value) AS v FROM ev GROUP BY h),
      |spine AS (SELECT unnest(generate_series((SELECT min(h) FROM hourly),
      |                                        (SELECT max(h) FROM hourly),
      |                                        INTERVAL 1 HOUR)) AS h),
      |j AS (SELECT s.h, hourly.v,
      |             (epoch_us(s.h) // 3600000000) AS pos
      |      FROM spine s LEFT JOIN hourly USING (h)),
      |f AS (SELECT h, v, pos,
      |        last_value(v IGNORE NULLS) OVER wb AS pv,
      |        last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER wb AS pp,
      |        first_value(v IGNORE NULLS) OVER wf AS nv,
      |        first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER wf AS np
      |      FROM j
      |      WINDOW wb AS (ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |             wf AS (ORDER BY pos ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT h,
      |       round(CASE WHEN v IS NOT NULL THEN v
      |                  ELSE pv + (nv - pv) * (pos - pp)::DOUBLE / (np - pp)::DOUBLE END,
      |             3) AS v_interp,
      |       (v IS NULL) AS interpolated
      |FROM f ORDER BY h""".stripMargin

  // ---------------------------------------------------------------- funnel (windowFunnel)
  /** Ordered 3-step funnel signup → click → purchase within 24 h of the
    * user's first signup (ClickHouse `windowFunnel(window)(ts, cond1,
    * cond2, cond3)`): how many users reached each step, with strict
    * temporal ordering between steps. Each step is one conditional
    * aggregate over the per-user event set; steps chain through joins on
    * user_id (user-keyed shuffles — the same key every step, so AQE
    * reuses the partitioning; at 100 TB users are hash-partitioned once).
    * Counting users who reached AT LEAST step k keeps the row monotone —
    * the standard funnel report shape. */
  def q83Funnel(s: SparkSession, dir: String): DataFrame = {
    // Single-pass formulation (how ClickHouse's windowFunnel actually
    // executes): collect each user's events in (ts, event_id) order and
    // fold a 3-slot state machine over them — t1 = first signup, t2 =
    // first click in (t1, t1+24h], t3 = first purchase in (t2, t1+24h].
    // Processing in time order makes "first satisfying event" ≡ the
    // min-ts the oracle's join chain computes. ONE user-keyed shuffle
    // replaces the previous 6-join chain, whose sequential AQE stages
    // cost 12+ s of driver latency regardless of data size; per-user
    // state is the event list (the same bound ClickHouse's windowFunnel
    // carries — q86 sequence-match already relies on it).
    val e = struct(unix_micros(col("ts")).as("tus"), col("event_id"),
      substring(col("event_type"), 1, 1).as("c"))
    val init = struct(lit(null).cast("long").as("t1"),
      lit(null).cast("long").as("t2"), lit(null).cast("long").as("t3"))
    val dayUs = 86400000000L
    def fold(acc: Column, ev: Column): Column = {
      val (t1, t2, t3) = (acc.getField("t1"), acc.getField("t2"), acc.getField("t3"))
      val (t, c) = (ev.getField("tus"), ev.getField("c"))
      val win = t1 + lit(dayUs)
      struct(
        when(t1.isNull && c === "s", t).otherwise(t1).as("t1"),
        when(t2.isNull && c === "c" && t1.isNotNull && t > t1 && t <= win, t)
          .otherwise(t2).as("t2"),
        when(t3.isNull && c === "p" && t2.isNotNull && t > t2 && t <= win, t)
          .otherwise(t3).as("t3"))
    }
    Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(aggregate(array_sort(collect_list(e)), init, fold).as("f"))
      .agg(count(col("f.t1")).as("n1"), count(col("f.t2")).as("n2"),
        count(col("f.t3")).as("n3"))
      .select(expr("stack(3, 1, n1, 2, n2, 3, n3) AS (step, n_users)"))
      .orderBy(col("step"))
  }

  val q83Sql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s.t1) AS t1
      |       FROM events e JOIN s1 s ON e.user_id = s.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s.t1
      |         AND e.ts <= s.t1 + INTERVAL 24 HOURS
      |       GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM events e JOIN s2 s ON e.user_id = s.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s.t2
      |         AND e.ts <= s.t1 + INTERVAL 24 HOURS
      |       GROUP BY e.user_id)
      |SELECT 1 AS step, count(*) AS n_users FROM s1
      |UNION ALL SELECT 2, count(*) FROM s2
      |UNION ALL SELECT 3, count(*) FROM s3
      |ORDER BY step""".stripMargin

  // ---------------------------------------------------------------- q198: multi-window funnel sweep
  /** windowFunnel parameter sweep — conversion at THREE window sizes
    * (1 h / 6 h / 24 h) from ONE user-keyed pass: the question behind
    * every windowFunnel dashboard is "how sensitive is conversion to the
    * window", and answering it with one fold per window re-shuffles the
    * fact table once per parameter. Here the per-user state machine
    * carries all three windows' slots simultaneously (t1 shared — first
    * signup is window-independent; per window the first qualifying click
    * then purchase), so the sweep costs exactly one user-keyed shuffle —
    * the same bound as single-window q83, whose greedy semantics each
    * window leg reproduces verbatim. Counts are exact integers; the
    * conversion share is integer-half-up at 4 dp (q134's trick). */
  def q198FunnelSweep(s: SparkSession, dir: String): DataFrame = {
    val e = struct(unix_micros(col("ts")).as("tus"), col("event_id"),
      substring(col("event_type"), 1, 1).as("c"))
    val hourUs = 3600000000L
    val windows = Seq(1L, 6L, 24L)
    val init = struct(
      (lit(null).cast("long").as("t1") +:
        windows.flatMap(w => Seq(
          lit(null).cast("long").as(s"t2_$w"),
          lit(null).cast("long").as(s"t3_$w")))): _*)
    def fold(acc: Column, ev: Column): Column = {
      val t1 = acc.getField("t1")
      val (t, c) = (ev.getField("tus"), ev.getField("c"))
      val fields = windows.flatMap { w =>
        val (t2, t3) = (acc.getField(s"t2_$w"), acc.getField(s"t3_$w"))
        val win = t1 + lit(w * hourUs)
        Seq(
          when(t2.isNull && c === "c" && t1.isNotNull && t > t1 && t <= win, t)
            .otherwise(t2).as(s"t2_$w"),
          when(t3.isNull && c === "p" && t2.isNotNull && t > t2 && t <= win, t)
            .otherwise(t3).as(s"t3_$w"))
      }
      struct((when(t1.isNull && c === "s", t).otherwise(t1).as("t1") +: fields): _*)
    }
    val folded = Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(aggregate(array_sort(collect_list(e)), init, fold).as("f"))
    val aggs = count(col("f.t1")).as("n1") +:
      windows.flatMap(w => Seq(
        count(col(s"f.t2_$w")).as(s"n2_$w"), count(col(s"f.t3_$w")).as(s"n3_$w")))
    val wide = folded.agg(aggs.head, aggs.tail: _*)
    val stackArgs = windows.map(w => s"${w}L, n1, n2_$w, n3_$w").mkString(", ")
    wide
      .select(expr(s"stack(${windows.size}, $stackArgs) AS (window_h, n1, n2, n3)"))
      // integer-half-up share at 4 dp: (n3·2·10⁴ + n1) DIV (2·n1);
      // greatest(n1,1) keeps an empty-signup slice at conv=0 instead of
      // null-vs-error divergence between engines
      .select(col("window_h"), col("n1"), col("n2"), col("n3"),
        (expr("(n3 * 20000 + n1) DIV (2 * greatest(n1, 1))").cast("double") / 10000.0).as("conv"))
      .orderBy(col("window_h"))
  }

  val q198Sql: String = {
    def leg(w: Long): String =
      s"""SELECT ${w}::BIGINT AS window_h,
         |  (SELECT count(*) FROM s1) AS n1,
         |  (SELECT count(*) FROM (
         |     SELECT e.user_id FROM events e JOIN s1 s ON e.user_id = s.user_id
         |     WHERE e.event_type = 'click' AND e.ts > s.t1
         |       AND e.ts <= s.t1 + INTERVAL $w HOURS GROUP BY e.user_id)) AS n2,
         |  (SELECT count(*) FROM (
         |     SELECT e.user_id FROM events e
         |     JOIN (SELECT e2.user_id, min(e2.ts) AS t2, min(s.t1) AS t1
         |           FROM events e2 JOIN s1 s ON e2.user_id = s.user_id
         |           WHERE e2.event_type = 'click' AND e2.ts > s.t1
         |             AND e2.ts <= s.t1 + INTERVAL $w HOURS
         |           GROUP BY e2.user_id) s2 ON e.user_id = s2.user_id
         |     WHERE e.event_type = 'purchase' AND e.ts > s2.t2
         |       AND e.ts <= s2.t1 + INTERVAL $w HOURS GROUP BY e.user_id)) AS n3""".stripMargin
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
       |            WHERE event_type = 'signup' GROUP BY user_id),
       |legs AS (${Seq(1L, 6L, 24L).map(leg).mkString("\nUNION ALL\n")})
       |SELECT window_h, n1, n2, n3,
       |       ((n3 * 20000 + n1) // (2 * greatest(n1, 1)))::DOUBLE / 10000.0 AS conv
       |FROM legs ORDER BY window_h""".stripMargin
  }

  // ---------------------------------------------------------------- retention
  /** Day-N retention of the day-0 cohort (ClickHouse `retention(cond0,
    * cond1, …)`): of the users active on the first observed day, how many
    * were active again N days later, for every observed offset. Activity
    * collapses to one row per (user, day) before anything joins — the
    * raw event volume never reaches the cohort join, and the day-0
    * scalars (d0, cohort size) are broadcast. The cohort itself is
    * DAU-proportional — NOT broadcast: the cohort join shuffles on
    * user_id, the key `active` is already partitioned by, so AQE adds no
    * extra exchange (and may still pick broadcast at small scale).
    * Ratio is a single division of exact integers. */
  def q84Retention(s: SparkSession, dir: String): DataFrame = {
    // Two jobs total. Job 1 fetches the one O(1) scalar (the first
    // observed day) — collected, not wired in as a broadcast-subquery
    // branch: every such branch is its own sequential AQE stage, and the
    // original persist+3-branch formulation spent 5+ s of driver stage
    // orchestration on 30 output rows. Job 2 is the whole retention
    // computation: (user, day) distinct → cohort membership as a
    // user-keyed window max (no self-join, same user_id partitioning the
    // distinct just produced) → day-offset counts. The cohort size needs
    // no extra pass either — every cohort user is active on day 0 by
    // definition, so it IS the offset-0 count, read back via a window
    // over the calendar-sized result.
    val d0Row = Tables.events(s, dir)
      .agg(min(to_date(col("ts"))).as("d0")).collect()(0)
    if (d0Row.isNullAt(0))
      return Tables.events(s, dir)
        .select(lit(0).as("day_offset"), lit(0L).as("n_active"),
          lit(0.0).as("ratio")).limit(0)
    val d0 = d0Row.getDate(0)
    val wUser = Window.partitionBy(col("user_id"))
    val wAll = Window.partitionBy()
    Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("in_cohort",
        max(when(col("day") === lit(d0), 1).otherwise(0)).over(wUser))
      .filter(col("in_cohort") === 1)
      .groupBy(datediff(col("day"), lit(d0)).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      // single-partition window over day-offset-cardinality rows (~tens)
      .withColumn("cohort_n",
        max(when(col("day_offset") === 0, col("n_active"))).over(wAll))
      .select(col("day_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_n"), 4).as("ratio"))
      .orderBy(col("day_offset"))
  }

  val q84Sql: String =
    """WITH active AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
      |d0 AS (SELECT min(day) AS d0 FROM active),
      |cohort AS (SELECT a.user_id FROM active a, d0 WHERE a.day = d0.d0),
      |cn AS (SELECT count(*) AS cohort_n FROM cohort)
      |SELECT date_diff('day', d0.d0, a.day) AS day_offset, count(*) AS n_active,
      |       round(count(*)::DOUBLE / cn.cohort_n, 4) AS ratio
      |FROM active a JOIN cohort c ON a.user_id = c.user_id, d0, cn
      |GROUP BY 1, cn.cohort_n ORDER BY day_offset""".stripMargin

  // ---------------------------------------------------------------- sequence matching (sequenceMatch)
  /** Pattern matching over each user's ordered event sequence (ClickHouse
    * `sequenceMatch('(?1)(?t<…)(?2)')`): collapse the per-user history to
    * an ordered type-initial string, then run a regex — here "signup,
    * then purchase, with no error in between" (`s[^e]*p`). The collapse
    * is one user-keyed aggregate (collect_list is bounded by per-user
    * event counts, the same bound ClickHouse's groupArray carries); the
    * regex is a codegen'd map over 1-row-per-user. Order is made total
    * with (ts, event_id) so both engines agree on the sequence string. */
  def q86SequenceMatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        x => x.getField("c")), "").as("seq"))
      .select(col("user_id"), length(col("seq")).as("n_events"),
        when(col("seq").rlike("s[^e]*p"), lit(1)).otherwise(lit(0)).as("converted"))
      .orderBy(col("user_id"))

  val q86Sql: String =
    """WITH seqs AS (SELECT user_id,
      |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |       FROM events GROUP BY user_id)
      |SELECT user_id, length(seq) AS n_events,
      |       CASE WHEN regexp_matches(seq, 's[^e]*p') THEN 1 ELSE 0 END AS converted
      |FROM seqs ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- sequence count (sequenceCount)
  /** ClickHouse `sequenceCount`: how many NON-OVERLAPPING times the
    * signup→purchase pattern fires per user (q86's sequenceMatch answers
    * "ever?"; this answers "how often?" — repeat-conversion analysis).
    * Same single user-keyed shuffle building the (ts, event_id)-ordered
    * type string; the count is one regexp_count over it — both engines
    * scan leftmost-first and resume after each match, and the pattern
    * stays in the Java∩RE2 subset every regex op here uses. Per-user
    * state is the type string (bounded by per-user activity, the same
    * bound the funnel/sequence family already carries). */
  def q152SequenceCount(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        x => x.getField("c")), "").as("seq"))
      .select(col("user_id"), length(col("seq")).as("n_events"),
        regexp_count(col("seq"), lit("s[^e]*p")).as("n_conversions"))
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- strict-order funnel (windowFunnel 'strict_order')
  /** ClickHouse `windowFunnel(... , 'strict_order')`: the view→click→
    * purchase funnel where ANY intervening event breaks the sequence —
    * steps must be CONSECUTIVE in the user's event stream, so the level-k
    * test is a plain substring ("vc", "vcp") on the (ts, event_id)-ordered
    * type string, not q86's gap-tolerant regex. Output is the per-level
    * user histogram (max strict level reached). Same single user-keyed
    * shuffle as the whole funnel/sequence family; per-user state is the
    * type string. */
  def q173FunnelStrict(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        x => x.getField("c")), "").as("seq"))
      .select(
        when(col("seq").contains("vcp"), lit(3))
          .when(col("seq").contains("vc"), lit(2))
          .when(col("seq").contains("v"), lit(1))
          .otherwise(lit(0)).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))

  val q173Sql: String =
    """WITH seqs AS (SELECT user_id,
      |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |       FROM events GROUP BY user_id),
      |lv AS (SELECT CASE WHEN contains(seq, 'vcp') THEN 3
      |                   WHEN contains(seq, 'vc') THEN 2
      |                   WHEN contains(seq, 'v') THEN 1
      |                   ELSE 0 END AS level
      |       FROM seqs)
      |SELECT level, count(*) AS n_users FROM lv
      |GROUP BY level ORDER BY level""".stripMargin

  val q152Sql: String =
    """WITH seqs AS (SELECT user_id,
      |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |       FROM events GROUP BY user_id)
      |SELECT user_id, length(seq) AS n_events,
      |       len(regexp_extract_all(seq, 's[^e]*p')) AS n_conversions
      |FROM seqs ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- cumulative distinct (audience growth)
  /** Audience growth curve: per event type and day, how many users appear
    * for the FIRST time, and the running distinct-user total — the
    * "count(DISTINCT) OVER" no SQL engine supports, decomposed into the
    * supported form: first-occurrence reduction (one (type,user)-keyed
    * aggregate, map-side combined) → per-day new-user counts → a running
    * sum over the DAY-GRAIN table. The window input is calendar-sized,
    * never the raw stream — the q112 vocab-growth trick on the user
    * dimension. All-integer. */
  def q156AudienceGrowth(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    firsts
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy(col("event_type"), col("day"))
  }

  val q156Sql: String =
    """WITH f AS (SELECT event_type, user_id,
      |             min(CAST(date_trunc('day', ts) AS DATE)) AS day
      |           FROM events GROUP BY 1, 2),
      |d AS (SELECT event_type, day, count(*) AS n_new FROM f GROUP BY 1, 2)
      |SELECT event_type, day, n_new,
      |       CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cum_users
      |FROM d ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- decile lift table
  /** Decile lift table — the model-evaluation / targeting report: users
    * ranked by activity, split into deciles, conversion rate and lift per
    * decile ("does the top decile convert more?"). Lift is computed as
    * ONE division of exact integer cross-products
    * (converters_d · total_users) / (users_d · total_converters) — no
    * ratio-of-rounded-ratios drift between engines. The decile label is
    * NOT a global ntile window (single-partition sort over the user
    * table): [[DistRank.withNtile]] computes the identical ANSI
    * assignment from a range-partitioned exact rank with broadcast
    * offsets — every stage linear or P-bounded, the oracle keeps the
    * naive ntile and the gate proves equality. The decile table the
    * totals read is 10 rows off the rank checkpoint, so the extra
    * aggregate is free. */
  def q158DecileLift(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
    val deciled = DistRank.withNtile(users, 10, "decile",
      Seq(col("n_events").desc, col("user_id")))
    val grp = deciled
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("users"), sum(col("converted")).as("converters"))
    grp
      .crossJoin(broadcast(grp.agg(
        sum(col("users")).as("tot_users"), sum(col("converters")).as("tot_conv"))))
      .select(col("decile"), col("users"), col("converters"),
        round(col("converters").cast("double") / col("users").cast("double"), 4).as("conv_rate"),
        // zero corpus conversions → lift is 0/0: NULL, not NaN (engines
        // disagree on 0/0; q107/q119/q166 apply the same normalization)
        when(col("tot_conv") === 0, lit(null).cast("double"))
          .otherwise(round((col("converters") * col("tot_users")).cast("double")
            / (col("users") * col("tot_conv")).cast("double"), 4)).as("lift"))
      .orderBy(col("decile"))
  }

  val q158Sql: String =
    """WITH u AS (SELECT user_id, count(*) AS n_events,
      |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |           FROM events GROUP BY user_id),
      |d AS (SELECT user_id, converted,
      |             ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile
      |      FROM u),
      |t AS (SELECT count(*) AS tot_users, sum(converted) AS tot_conv FROM u)
      |SELECT decile, count(*) AS users, CAST(sum(converted) AS BIGINT) AS converters,
      |       round(sum(converted)::DOUBLE / count(*)::DOUBLE, 4) AS conv_rate,
      |       CASE WHEN max(t.tot_conv) = 0 THEN NULL
      |            ELSE round((sum(converted) * max(t.tot_users))::DOUBLE
      |                       / (count(*) * max(t.tot_conv))::DOUBLE, 4) END AS lift
      |FROM d CROSS JOIN t GROUP BY decile ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- sequential-pattern support
  /** Sequential-pattern support (the PrefixSpan counting step at length
    * 2): for every ordered type pair (A then B), how many users did A
    * strictly before their first B — ALL ordered pairs at ANY distance,
    * where Markov (q108) sees only adjacency and the funnel (q83) a fixed
    * chain. First-occurrence reduction first ((user, type) argmin — one
    * map-side-combined aggregate), so the self-join runs on the
    * type-grain table: ≤ |types| rows per user, pair work |types|²
    * bounded per user regardless of activity. Support denominator
    * broadcast. (ts, event_id) lexicographic order makes ties exact. */
  def q162SeqPairs(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("user_id"), col("event_type"),
        col("f.ts").as("ts"), col("f.event_id").as("eid"))
    firsts.as("a").join(firsts.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") =!= col("b.event_type") &&
        (col("a.ts") < col("b.ts") ||
          (col("a.ts") === col("b.ts") && col("a.eid") < col("b.eid"))))
      .groupBy(col("a.event_type").as("first_type"), col("b.event_type").as("then_type"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(Tables.events(s, dir)
        .agg(countDistinct(col("user_id")).as("n_total"))))
      .select(col("first_type"), col("then_type"), col("n_users"),
        round(col("n_users").cast("double") / col("n_total").cast("double"), 4).as("support"))
      .orderBy(col("n_users").desc, col("first_type"), col("then_type"))
  }

  val q162Sql: String =
    """WITH f AS (SELECT user_id, event_type,
      |             min(struct_pack(ts := ts, eid := event_id)) AS f
      |           FROM events GROUP BY 1, 2),
      |fx AS (SELECT user_id, event_type, f.ts AS ts, f.eid AS eid FROM f),
      |t AS (SELECT count(DISTINCT user_id) AS n_total FROM events)
      |SELECT a.event_type AS first_type, b.event_type AS then_type,
      |       count(*) AS n_users,
      |       round(count(*)::DOUBLE / max(t.n_total)::DOUBLE, 4) AS support
      |FROM fx a JOIN fx b
      |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
      | AND (a.ts < b.ts OR (a.ts = b.ts AND a.eid < b.eid))
      |CROSS JOIN t
      |GROUP BY 1, 2 ORDER BY n_users DESC, first_type, then_type""".stripMargin

  // ---------------------------------------------------------------- latest state (ReplacingMergeTree / CDC upsert)
  /** Latest-state-per-key semantics — the ReplacingMergeTree / CDC-upsert
    * read: for each (user, event_type) stream key, the most recent
    * event's payload wins ((ts, event_id) is the version order; the id
    * breaks timestamp ties deterministically). One lexicographic argmax
    * aggregate — no window sort, no self-join; at 100 TB this is a single
    * user-keyed shuffle with map-side partial maxima, the same plan shape
    * that compacts a CDC changelog into current state. */
  def q87LatestState(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.ts").as("last_ts"), col("last.event_id").as("last_event_id"),
        round(col("last.value"), 2).as("last_value"))
      .orderBy(col("user_id"), col("event_type"))

  val q87Sql: String =
    """SELECT user_id, event_type,
      |  max(struct_pack(ts := ts, event_id := event_id, v := value)).ts AS last_ts,
      |  max(struct_pack(ts := ts, event_id := event_id, v := value)).event_id AS last_event_id,
      |  round(max(struct_pack(ts := ts, event_id := event_id, v := value)).v, 2) AS last_value
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- max concurrent intervals (maxIntersections)
  /** Peak concurrency over intervals (ClickHouse `maxIntersections` /
    * `maxIntersectionsPosition`): the maximum number of user-day activity
    * spans ([first event, last event] per user per day) active at one
    * instant, plus the earliest instant it is reached. Sweep-line as a
    * DISTRIBUTED two-pass prefix sum — the textbook formulation's single
    * global running sum would serialize 2·|spans| rows through one
    * partition at 100 TB. Pass 1 aggregates per-day delta totals (one row
    * per calendar day) and turns them into per-day starting offsets with
    * a driver-scale cumulative sum; pass 2 computes the running sum
    * WITHIN each day partition and adds the broadcast offset. Endpoints
    * sort starts-before-ends at equal t (d DESC), so touching intervals
    * count as concurrent — ties within a (t,d) group all carry the same
    * delta, so the attained maximum is order-independent. */
  def q97MaxIntersections(s: SparkSession, dir: String): DataFrame = {
    // endpoints via explode, not a self-union — one events scan, one
    // span aggregation. The span-endpoint table (2 rows per user-day) is
    // cached because it feeds both the offset pass and the sweep pass.
    val deltas = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .select(explode(array(
        struct(col("lo").as("t"), lit(1).as("d")),
        struct(col("hi").as("t"), lit(-1).as("d")))).as("e"))
      .select(col("e.t").as("t"), col("e.d").as("d"),
        date_trunc("day", col("e.t")).as("blk"))
      .persist()
    try {
      // pass 1: per-block totals → running offsets. One row per calendar
      // day — the single-partition window here is over the tiny block
      // table, never the data.
      val wOff = Window.orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = deltas.groupBy(col("blk")).agg(sum(col("d")).as("bs"))
        .withColumn("off", coalesce(sum(col("bs")).over(wOff), lit(0L)))
        .select(col("blk"), col("off"))
      // pass 2: block-local running sum + broadcast block offset = global
      // running concurrency, fully parallel across days. The peak and its
      // earliest instant come from ONE lexicographic argmax (negated time
      // breaks ties toward the earliest), not a max-then-rejoin.
      val wIn = Window.partitionBy(col("blk"))
        .orderBy(col("t"), col("d").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      deltas.join(broadcast(off), Seq("blk"))
        .withColumn("c", sum(col("d")).over(wIn) + col("off"))
        .agg(max(struct(col("c"),
          (lit(0L) - unix_micros(col("t"))).as("nt"))).as("m"))
        // ungrouped agg over empty input yields one NULL row where the
        // oracle's correlated filter yields none — drop it for parity
        .filter(col("m").isNotNull)
        .select(col("m.c").as("peak"),
          timestamp_micros(lit(0L) - col("m.nt")).as("t_peak"))
        .localCheckpoint(true)
    } finally deltas.unpersist(false)
  }

  val q97Sql: String =
    """WITH spans AS (SELECT user_id, date_trunc('day', ts) AS day,
      |                      min(ts) AS lo, max(ts) AS hi
      |               FROM events GROUP BY user_id, date_trunc('day', ts)),
      |deltas AS (SELECT lo AS t, 1 AS d FROM spans
      |           UNION ALL SELECT hi AS t, -1 AS d FROM spans),
      |run AS (SELECT t, (sum(d) OVER (ORDER BY t, d DESC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS c
      |        FROM deltas)
      |SELECT c AS peak, min(t) AS t_peak FROM run
      |WHERE c = (SELECT max(c) FROM run) GROUP BY c""".stripMargin

  // ---------------------------------------------------------------- last-touch attribution
  /** Last-touch attribution: each purchase is credited to the user's most
    * recent PRECEDING click, and counts as attributed when that click
    * falls within the 1-hour lookback. The "most recent preceding
    * matching event" is a frame-bounded conditional max (ClickHouse
    * would reach for `neighbor`/`anyLast` over a sorted stream) — one
    * user-keyed window pass, no self-join of purchases against clicks.
    * (ts,event_id) is the total frame order, so the frame content — and
    * hence every credited pair — is engine-exact. Daily report keyed on
    * purchase day. */
  def q98Attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val hourUs = 3600000000L
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
      .withColumn("lc",
        max(when(col("event_type") === "click", col("tus"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        col("lc").isNotNull && col("lc") >= col("tus") - lit(hourUs))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        round(sum(when(col("attributed"), col("value")).otherwise(lit(0.0))), 2)
          .as("attributed_value"))
      .orderBy(col("day"))
  }

  val q98Sql: String =
    """WITH ev AS (SELECT user_id, event_type, value, ts,
      |                   epoch_us(ts) AS tus, event_id FROM events),
      |marked AS (SELECT *, max(CASE WHEN event_type = 'click' THEN tus END)
      |             OVER (PARTITION BY user_id ORDER BY tus, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
      |           FROM ev)
      |SELECT date_trunc('day', ts) AS day,
      |  count(*) AS n_purchases,
      |  (sum(CASE WHEN lc IS NOT NULL AND lc >= tus - 3600000000
      |       THEN 1 ELSE 0 END))::BIGINT AS n_attributed,
      |  round(sum(CASE WHEN lc IS NOT NULL AND lc >= tus - 3600000000
      |       THEN value ELSE 0 END), 2) AS attributed_value
      |FROM marked WHERE event_type = 'purchase'
      |GROUP BY date_trunc('day', ts) ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- trailing-window anomaly screen
  /** Volume-anomaly screen: each (event_type, day) count is z-scored
    * against the TRAILING 7 days (frame excludes the current row — the
    * day under test must not contaminate its own baseline). Mean and
    * variance come from avg(n)/avg(n²) over the frame — plain IEEE
    * arithmetic in a deterministic frame order, bit-identical across
    * engines, unlike builtin stddev whose accumulation scheme is
    * engine-private. Days without a full 7-day history are excluded
    * rather than scored against a short baseline. One type-keyed window
    * over the already-aggregated daily table — the raw scan aggregates
    * first, so the window input is calendar-sized, not event-sized. */
  def q99Anomaly(s: SparkSession, dir: String): DataFrame = {
    // RANGE frame over an integer day number, not ROWS: with a ROWS
    // frame a zero-event day silently stretches "7 preceding rows" over
    // more than 7 calendar days. Under RANGE the frame is the calendar
    // window [d-7, d-1] and the full-history gate (exactly 7 rows in it)
    // holds only when all 7 prior days are present.
    val w = Window.partitionBy(col("event_type")).orderBy(col("dn"))
      .rangeBetween(-7, -1)
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dn", datediff(col("day"), to_date(lit("1970-01-01"))))
      .withColumn("n_frame", count(col("n")).over(w))
      .withColumn("mean7", avg(col("n")).over(w))
      // square in double: BIGINT n*n would overflow (ANSI throw) past
      // ~3e9 events/day; exact-integer doubles stay exact below 2^53
      .withColumn("m2",
        avg(col("n").cast("double") * col("n").cast("double")).over(w))
      .filter(col("n_frame") === 7)
      .withColumn("sd",
        sqrt(greatest(col("m2") - col("mean7") * col("mean7"), lit(0.0))))
      .withColumn("z",
        when(col("sd") > 0, round((col("n") - col("mean7")) / col("sd"), 4)))
      .select(col("event_type"), col("day"), col("n"),
        round(col("mean7"), 4).as("mean7"), col("z"),
        when(col("z").isNotNull && col("z") > lit(2.0), 1).otherwise(0)
          .as("is_spike"))
      .orderBy(col("event_type"), col("day"))
  }

  val q99Sql: String =
    """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
      |                      count(*) AS n,
      |                      date_diff('day', DATE '1970-01-01',
      |                                date_trunc('day', ts)) AS dn
      |               FROM events
      |               GROUP BY event_type, date_trunc('day', ts)),
      |sc AS (SELECT event_type, day, n,
      |         count(n) OVER w AS n_frame,
      |         avg(n) OVER w AS mean7,
      |         avg((n::DOUBLE)*(n::DOUBLE)) OVER w AS m2
      |       FROM daily
      |       WINDOW w AS (PARTITION BY event_type ORDER BY dn
      |                    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT event_type, day, n, mean7,
      |        CASE WHEN sqrt(greatest(m2 - mean7*mean7, 0)) > 0
      |             THEN round((n - mean7) / sqrt(greatest(m2 - mean7*mean7, 0)), 4)
      |        END AS z
      |      FROM sc WHERE n_frame = 7)
      |SELECT event_type, day, n, round(mean7, 4) AS mean7, z,
      |       CASE WHEN z IS NOT NULL AND z > 2.0 THEN 1 ELSE 0 END AS is_spike
      |FROM z ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- exponential moving average
  /** Exponentially weighted trailing value (ClickHouse
    * `exponentialMovingAverage`): per user, α = ½ over the last 8
    * events. α = ½ is chosen deliberately — every weight is a power of
    * two, so each term `value·2⁻ᵏ` is an EXACT float scaling and the
    * left-associated 8-term sum is bit-identical across engines (a
    * general α would hit `pow`, which is not bit-portable). The window
    * recursion unrolls to 8 `lag` terms over one user-keyed sort — a
    * single window pass, no per-row sub-frame aggregation; at 100 TB
    * this is one shuffle on user_id with 8 prior rows of state. */
  def q101Ema(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    def term(k: Int): Column =
      coalesce(lag(col("value"), k).over(w), lit(0.0)) / lit(1L << (k + 1))
    Tables.events(s, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("ts"), col("value"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
      // α=½ terms are finite DECIMALS too (v has 2 decimals, /2^k keeps a
      // finite expansion), so the 4-decimal round constantly lands on
      // exact .5 boundaries where Spark's BigDecimal HALF_UP and DuckDB's
      // float-scaled round disagree. floor(x·10⁴ + ½)/10⁴ is the same
      // IEEE op sequence in both engines (q92's trick).
      .withColumn("ema",
        floor((0 to 7).map(term).reduceLeft(_ + _) * lit(10000L) + lit(0.5))
          / lit(10000L))
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value"), 2).as("value"), col("ema"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val q101Sql: String = {
    val terms = (0 to 7).map { k =>
      s"coalesce(lag(value, $k) OVER w, 0.0) / ${1L << (k + 1)}"
    }.mkString(" + ")
    s"""SELECT user_id, ts, event_id, round(value, 2) AS value,
       |  floor(($terms) * 10000 + 0.5) / 10000 AS ema
       |FROM events WHERE user_id < 20
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
       |ORDER BY user_id, ts, event_id""".stripMargin
  }

  // ---------------------------------------------------------------- counter rate (deltaSum)
  /** Monotonic-counter rate with reset detection (ClickHouse `deltaSum`,
    * PromQL `rate()`): per user, the sum of POSITIVE adjacent deltas of
    * the gauge — decreases are counter resets, counted but not summed.
    * One lag over the (ts,event_id)-ordered stream, then a user-keyed
    * aggregate; the observation span normalizes to a per-hour rate.
    * Delta/sum/divide are plain IEEE ops in deterministic order. */
  def q102CounterRate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("value"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
      .withColumn("d", col("value") - lag(col("value"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(col("d")).as("n_deltas"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_resets"),
        round(sum(when(col("d") > 0, col("d")).otherwise(lit(0.0))), 2)
          .as("increase"),
        ((max(col("tus")) - min(col("tus"))) / lit(3600000000L))
          .cast("double").as("span_h"))
      .filter(col("span_h") > 0)
      .withColumn("rate_per_h", round(col("increase") / col("span_h"), 4))
      .select(col("user_id"), col("n_deltas"), col("n_resets"),
        col("increase"), col("rate_per_h"))
      .orderBy(col("user_id"))
  }

  val q102Sql: String =
    """WITH d AS (SELECT user_id,
      |             value - lag(value, 1) OVER (PARTITION BY user_id
      |               ORDER BY epoch_us(ts), event_id) AS d,
      |             epoch_us(ts) AS tus
      |           FROM events WHERE user_id < 50),
      |agg AS (SELECT user_id, count(d) AS n_deltas,
      |          (sum(CASE WHEN d < 0 THEN 1 ELSE 0 END))::BIGINT AS n_resets,
      |          round(sum(CASE WHEN d > 0 THEN d ELSE 0.0 END), 2) AS increase,
      |          ((max(tus) - min(tus)) / 3600000000)::DOUBLE AS span_h
      |        FROM d GROUP BY user_id)
      |SELECT user_id, n_deltas, n_resets, increase,
      |       round(increase / span_h, 4) AS rate_per_h
      |FROM agg WHERE span_h > 0 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- time-weighted average
  /** Time-weighted gauge average over irregular samples (ClickHouse
    * `avgWeighted` with Δt weights — the time-series way to average a
    * gauge that is sampled unevenly: each reading counts for the span it
    * was current, Σ vᵢ·Δtᵢ / Σ Δtᵢ, last reading carries no forward
    * span). One lead() over the (ts,event_id)-ordered user stream, then a
    * user-keyed aggregate — no self-join; at 100 TB this is one shuffle
    * on user_id. Arithmetic is integer-exact end to end: values quantize
    * to cents with q92's floor(x·100+½) (identical IEEE ops in both
    * engines), spans are integer microseconds, and Σ(cents·Δtµs) stays
    * below 2⁶³ up to cents·span ≈ 9e18 (here ≤ 5.6e4 · 2.6e12 ≈ 1.5e17;
    * at larger value·span products, swap the accumulator to DECIMAL) —
    * so the only doubles are the two final divisions. */
  def q103TimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 40)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("value"))
      .withColumn("v100", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .withColumn("dtus", lead(col("tus"), 1).over(w) - col("tus"))
      .filter(col("dtus").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("v100") * col("dtus")).as("num"),
        sum(col("dtus")).as("den"),
        sum(col("v100")).as("vsum"))
      .filter(col("den") > 0)
      // floor(x·10⁴+½)/10⁴, not round(): the quotients land on exact .5
      // boundaries (cents/integer-µs rationals), where Spark's BigDecimal
      // HALF_UP and DuckDB's float-scaled round disagree — this is the
      // same IEEE op sequence in both engines (q92/q101's trick)
      .select(col("user_id"), col("n_spans"),
        (floor(col("num").cast("double") / (col("den") * 100).cast("double")
          * lit(10000L) + lit(0.5)) / lit(10000L)).as("time_weighted_avg"),
        (floor(col("vsum").cast("double") / (col("n_spans") * 100).cast("double")
          * lit(10000L) + lit(0.5)) / lit(10000L)).as("plain_avg"))
      .orderBy(col("user_id"))
  }

  val q103Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
      |              floor(value * 100 + 0.5)::BIGINT AS v100
      |            FROM events WHERE user_id < 40),
      |sp AS (SELECT user_id, v100,
      |         lead(tus, 1) OVER (PARTITION BY user_id
      |           ORDER BY tus, event_id) - tus AS dtus
      |       FROM ev),
      |agg AS (SELECT user_id, count(*) AS n_spans,
      |          sum(v100 * dtus)::BIGINT AS num, sum(dtus)::BIGINT AS den,
      |          sum(v100)::BIGINT AS vsum
      |        FROM sp WHERE dtus IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_spans,
      |       floor(num::DOUBLE / (den * 100)::DOUBLE * 10000 + 0.5) / 10000 AS time_weighted_avg,
      |       floor(vsum::DOUBLE / (n_spans * 100)::DOUBLE * 10000 + 0.5) / 10000 AS plain_avg
      |FROM agg WHERE den > 0 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q121: ordered array agg (groupArray)
  /** ClickHouse `groupArray` with a deterministic order: the first five
    * acting users per event type, as an array column, in (ts, event_id)
    * arrival order. collect_list alone is assembly-order-nondeterministic
    * — the struct sort supplies the total order, making the array
    * hash-stable across engines and executor counts. At 100 TB collect
    * per group is unbounded state: cap the input FIRST (rank window or
    * TopK aggregator) and collect only the survivors — here the cap is
    * the post-sort slice, correct because the sort is total.
    * The array is serialized to a comma-joined string for the gate: the
    * driver's pandas hasher can't sort ndarray-typed cells (round-3
    * q121/q170 failures), and a canonical string is engine-neutral. */
  def q121GroupArray(s: SparkSession, dir: String): DataFrame =
    // k-bounded FirstK aggregator, not collect_list+sort+slice: the
    // collect form buffers a TYPE'S ENTIRE event stream in one
    // aggregation buffer before sorting (with ~5 types that is the whole
    // corpus across 5 buffers — OOM at scale); FirstK ships ≤ 5 triples
    // per partition per type and the result is identical
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        concat_ws(",", transform(
          graft.functions.TopK.first_k(5)(
            unix_micros(col("ts")), col("event_id"), col("user_id")),
          e => e.getField("_3"))).as("first5_users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q121Sql: String =
    """SELECT event_type,
      |       array_to_string((list(user_id ORDER BY ts, event_id))[1:5], ',') AS first5_users,
      |       count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q124: burst collapse (alert-storm thinning)
  /** Alert-storm collapse — the log-pipeline dedup the reference's trace
    * stream needs downstream: within each event type, keep only events
    * that START a burst (gap from the previous event of that type
    * > 30 min) and report the thinning rate. One lag() pass over the
    * type-keyed time order; the gap test is exact microsecond integer
    * arithmetic. Per-type partitioning is deliberate (storms are
    * cross-user); the skew ceiling is events-per-type — salt the window
    * key by day if one type dominates at 100 TB. */
  def q124BurstCollapse(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("keep",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(sum(col("keep")).as("kept"), count(lit(1)).as("total"))
      .withColumn("keep_frac",
        round(col("kept").cast("double") / col("total"), 4))
      .orderBy(col("event_type"))
  }

  val q124Sql: String =
    """WITH l AS (SELECT event_type, ts,
      |                  lag(ts) OVER (PARTITION BY event_type
      |                                ORDER BY ts, event_id) AS prev_ts
      |           FROM events)
      |SELECT event_type,
      |       CAST(sum(CASE WHEN prev_ts IS NULL
      |                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      |       count(*) AS total,
      |       round(sum(CASE WHEN prev_ts IS NULL
      |                        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
      |                      THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS keep_frac
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q133: 3-step path analysis
  /** Top-20 three-step event paths (the Sankey/flow counts): consecutive
    * type triples per user in (ts, event_id) order. Two lead() columns
    * over the same user-keyed window q108 already pays — one shuffle,
    * path space bounded by |types|³, ranking on the |types|³-sized count
    * table. */
  def q133PathTriples(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val triples = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(w))
      .withColumn("s3", lead(col("s1"), 2).over(w))
      .filter(col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3")).agg(count(lit(1)).as("n"))
    // top-20 as TakeOrderedAndProject then a 20-row rank (q113's
    // limit-then-rank shape — the total order makes them row-identical);
    // the triple-count input is |types|³-bounded anyway, but the limit
    // keeps the unpartitioned window provably k-row in the plan itself
    triples
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3")).limit(20)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))))
      .select(col("rn"), col("s1"), col("s2"), col("s3"), col("n"))
      .orderBy(col("rn"))
  }

  val q133Sql: String =
    """WITH t AS (SELECT event_type AS s1,
      |                  lead(event_type, 1) OVER w AS s2,
      |                  lead(event_type, 2) OVER w AS s3
      |           FROM events
      |           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (SELECT s1, s2, s3, count(*) AS n FROM t
      |      WHERE s3 IS NOT NULL GROUP BY 1, 2, 3)
      |SELECT row_number() OVER (ORDER BY n DESC, s1, s2, s3) AS rn,
      |       s1, s2, s3, n
      |FROM c
      |QUALIFY rn <= 20
      |ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- q134: RFM segmentation
  /** RFM customer segmentation on purchase events: per user the
    * recency (days since last purchase, vs the corpus max day),
    * frequency (purchase count) and monetary (value sum), each cut into
    * quartiles by ntile over a TOTAL order (metric, then user_id — ties
    * must break identically in every engine or segment counts drift),
    * then segment sizes. All three quartile labels come from ONE fused
    * [[DistRank.withNtiles]] pass (long-format union, range-partitioned
    * exact rank with the metric id as the bounded group, broadcast
    * offsets — no global window funnels the user table through one task,
    * and no per-metric shuffle repeats); the per-user frame is
    * checkpointed once. Money is carried as
    * EXACT integer cents from the first aggregation (per-event
    * round(value·100) — one deterministic per-row op), so sums, sort
    * keys, and the segment average are engine- and order-invariant;
    * summing raw doubles and rounding at the end is half-a-cent
    * nondeterministic (observed at sf0.01). */
  def q134RfmSegments(s: SparkSession, dir: String): DataFrame = {
    // the fact aggregation is checkpointed BEFORE the max-day broadcast:
    // deriving maxDay from the un-materialized per0 would re-run the
    // events aggregation inside the broadcast subquery — two fact passes
    // for one materialization. LAZY checkpoint: the max-day broadcast
    // build is the first consumer and populates the cache as a side
    // effect, so the fact pass needs no dedicated job + driver barrier
    val per0 = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(date_trunc("day", col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .localCheckpoint(false)
    // corpus max day via aggregate + broadcast, not a global unpartitioned
    // window (which funnels the whole entity table through one partition
    // for a single scalar — the q123 anti-pattern); recency is a narrow
    // projection over the checkpointed frame, needing no re-materialization
    val maxDay = per0.agg(max(col("last_day")).as("max_day"))
    val per = per0.crossJoin(broadcast(maxDay))
      .withColumn("recency_d", datediff(col("max_day"), col("last_day")))
    // one payload materialization, ONE fused rank pass for all three
    // metrics — not three chained full-payload range-shuffles+checkpoints
    // (round-5 shape, 3× the materialization and 3× the jobs)
    val labeled = DistRank.withNtiles(per, 4, "user_id", Seq(
      ("recency_d", true,  "r_q"),   // recent = 1
      ("freq",      false, "f_q"),   // frequent = 1
      ("cents",     false, "m_q")))  // big spender = 1
    labeled
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("sc"))
      // 4dp half-up rounding done in INTEGER space: avg·10⁴ = sc·100/n,
      // rounded = (sc·200 + n) DIV (2n). float round() halves at exact
      // decimal boundaries differ between engines (Spark BigDecimal
      // HALF_UP on the shortest repr vs C-round on the binary double —
      // observed: 579.52375 → .5238 vs .5237); integers cannot disagree
      .select(col("r_q"), col("f_q"), col("m_q"), col("n_users"),
        (expr("(sc * 200 + n_users) DIV (2 * n_users)").cast("double") / 10000.0)
          .as("avg_monetary"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  val q134Sql: String =
    """WITH per AS (
      |  SELECT user_id, max(date_trunc('day', ts)) AS last_day,
      |         count(*) AS freq,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |r AS (SELECT user_id, freq, cents,
      |             date_diff('day', last_day, max(last_day) OVER ()) AS recency_d
      |      FROM per),
      |q AS (SELECT ntile(4) OVER (ORDER BY recency_d, user_id) AS r_q,
      |             ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
      |             ntile(4) OVER (ORDER BY cents DESC, user_id) AS m_q,
      |             cents
      |      FROM r)
      |SELECT r_q, f_q, m_q, count(*) AS n_users,
      |       ((sum(cents) * 200 + count(*)) // (2 * count(*)))::DOUBLE / 10000.0
      |         AS avg_monetary
      |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q135: cohort LTV curves
  /** Weekly-cohort cumulative-value (LTV) curves: users grouped by first
    * purchase week, revenue accumulated per week offset, divided by the
    * FIXED cohort size (not the week's actives — the standard LTV
    * denominator). Three entity-grain aggregations chained: user→first
    * week (one shuffle of purchases), (cohort, offset)→cents, then a
    * running sum over the cohort-sized curve table. Money as exact
    * integer cents; the per-user division rounds in integer space
    * (q134's half-up trick) — engine-invariant at any scale. */
  def q135CohortLtv(s: SparkSession, dir: String): DataFrame = {
    val pur = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
        round(col("value") * 100).cast("long").as("cents"))
    pur.persist()
    try {
      val firstWk = pur.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      val sizes = firstWk.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
      val curve = pur.join(firstWk, Seq("user_id"))
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int").as("offset_w"))
        .agg(sum(col("cents")).as("wk_cents"))
        .withColumn("cum_cents", sum(col("wk_cents")).over(
          Window.partitionBy(col("cohort")).orderBy(col("offset_w"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      curve.join(broadcast(sizes), Seq("cohort"))
        .select(col("cohort"), col("offset_w"), col("cohort_users"),
          (expr("(cum_cents * 200 + cohort_users) DIV (2 * cohort_users)")
            .cast("double") / 10000.0).as("ltv_per_user"))
        .orderBy(col("cohort"), col("offset_w"))
        .localCheckpoint(true)
    } finally pur.unpersist(false)
  }

  val q135Sql: String =
    """WITH pur AS (SELECT user_id, date_trunc('week', ts) AS wk,
      |                    CAST(round(value * 100) AS BIGINT) AS cents
      |             FROM events WHERE event_type = 'purchase'),
      |fw AS (SELECT user_id, min(wk) AS cohort FROM pur GROUP BY user_id),
      |sz AS (SELECT cohort, count(*) AS cohort_users FROM fw GROUP BY cohort),
      |curve AS (SELECT f.cohort,
      |                 CAST(date_diff('day', f.cohort, p.wk) // 7 AS INT) AS offset_w,
      |                 CAST(sum(p.cents) AS BIGINT) AS wk_cents
      |          FROM pur p JOIN fw f USING (user_id) GROUP BY 1, 2),
      |cum AS (SELECT cohort, offset_w,
      |               CAST(sum(wk_cents) OVER (PARTITION BY cohort ORDER BY offset_w
      |                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |                 AS cum_cents
      |        FROM curve)
      |SELECT c.cohort, c.offset_w, s.cohort_users,
      |       ((c.cum_cents * 200 + s.cohort_users) // (2 * s.cohort_users))::DOUBLE
      |         / 10000.0 AS ltv_per_user
      |FROM cum c JOIN sz s USING (cohort)
      |ORDER BY c.cohort, c.offset_w""".stripMargin

  // ---------------------------------------------------------------- q137: conversion matrix
  /** Pairwise 1-hour conversion matrix: for every ordered type pair
    * (a, b), the share of a-events followed by a b-event from the same
    * user within the next hour — every windowFunnel step pair at once.
    * ONE user-keyed self-join bounded by the time window covers all
    * |types|² cells (per-user event counts are small, so the join is
    * Σ|events(u)|² — entity-bounded like q127); distinct a-events in
    * the numerator, type totals broadcast for the denominator. Exact
    * integer counts; one rounded division per cell. */
  def q137ConversionMatrix(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    ev.persist()
    try {
      val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_a"))
      val conv = ev.as("a")
        .join(ev.select(col("user_id").as("u2"), col("event_type").as("b_type"),
            col("us").as("us2")).as("b"),
          col("user_id") === col("u2") &&
          col("us2") > col("us") && col("us2") <= col("us") + 3600000000L)
        .groupBy(col("event_type").as("a_type"), col("b_type"))
        .agg(countDistinct(col("event_id")).as("n_conv"))
      conv
        .join(broadcast(totals.withColumnRenamed("event_type", "a_type")), Seq("a_type"))
        .select(col("a_type"), col("b_type"), col("n_conv"), col("n_a"),
          round(col("n_conv").cast("double") / col("n_a"), 4).as("conv_rate"))
        .orderBy(col("a_type"), col("b_type"))
        .localCheckpoint(true)
    } finally ev.unpersist(false)
  }

  val q137Sql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |tot AS (SELECT event_type, count(*) AS n_a FROM ev GROUP BY 1),
      |conv AS (SELECT a.event_type AS a_type, b.event_type AS b_type,
      |                count(DISTINCT a.event_id) AS n_conv
      |         FROM ev a JOIN ev b
      |           ON a.user_id = b.user_id
      |          AND b.us > a.us AND b.us <= a.us + 3600000000
      |         GROUP BY 1, 2)
      |SELECT c.a_type, c.b_type, c.n_conv, t.n_a,
      |       round(c.n_conv::DOUBLE / t.n_a, 4) AS conv_rate
      |FROM conv c JOIN tot t ON t.event_type = c.a_type
      |ORDER BY c.a_type, c.b_type""".stripMargin

  // ---------------------------------------------------------------- q138: forward fill (LOCF)
  /** Forward-fill gap filling (last observation carried forward) — the
    * OTHER fill semantics next to q82's zero-fill: a gauge metric (here,
    * each hour's max event value per type) holds its last reading
    * through silent hours instead of dropping to zero. Same one-scan
    * spine construction as q82; the carry is one `last(ignoreNulls)`
    * window per type over the calendar-sized joined spine. The
    * observed-hour maxima are exact row values (no accumulation), so
    * carried values match the oracle bit-for-bit. */
  def q138ForwardFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(max(col("value")).as("v"))
      .localCheckpoint(true)
    val b = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi")).collect()(0)
    if (b.isNullAt(0))
      // schema must match the normal path (v_ff, carried), not hourly's
      return hourly.limit(0).select(col("event_type"), col("h"),
        col("v").as("v_ff"), lit(0).as("carried"))
    val spine = hourly.select(col("event_type")).distinct()
      .crossJoin(s.range(1).select(explode(sequence(
        lit(b.getTimestamp(0)), lit(b.getTimestamp(1)),
        expr("interval 1 hour"))).as("h")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .withColumn("v_ff", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("v_ff").isNotNull)          // hours before the first reading
      .withColumn("carried", when(col("v").isNull, 1).otherwise(0))
      .select(col("event_type"), col("h"), col("v_ff"), col("carried"))
      .orderBy(col("event_type"), col("h"))
  }

  val q138Sql: String =
    """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
      |                       max(value) AS v
      |                FROM events WHERE event_type IN ('purchase', 'error')
      |                GROUP BY 1, 2),
      |b AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
      |spine AS (SELECT t.event_type, g.h
      |          FROM (SELECT DISTINCT event_type FROM hourly) t
      |          CROSS JOIN (SELECT unnest(generate_series(
      |                        (SELECT lo FROM b), (SELECT hi FROM b),
      |                        INTERVAL 1 HOUR)) AS h) g),
      |j AS (SELECT s.event_type, s.h, hr.v FROM spine s
      |      LEFT JOIN hourly hr ON hr.event_type = s.event_type AND hr.h = s.h),
      |ff AS (SELECT event_type, h, v,
      |              last_value(v IGNORE NULLS) OVER
      |                (PARTITION BY event_type ORDER BY h
      |                 ROWS UNBOUNDED PRECEDING) AS v_ff
      |       FROM j)
      |SELECT event_type, h, v_ff,
      |       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS carried
      |FROM ff WHERE v_ff IS NOT NULL
      |ORDER BY event_type, h""".stripMargin

  // ---------------------------------------------------------------- q139: funnel latency
  /** Time-to-convert distribution: for users whose first click follows
    * their first signup within 24h (q83's step-2 population), the
    * latency percentiles in seconds. Two per-user min aggregations (one
    * user-keyed shuffle each, map-side combined), a user-grain join, and
    * exact interpolated percentiles over µs-integer latencies (q42's
    * percentile↔quantile_cont parity). The funnel tells you how many
    * converted; this says how fast — the pair dashboards ship together. */
  def q139FunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("t1"))
    val c1 = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("tc"))
    s1.join(c1, Seq("user_id"))
      .filter(col("tc") > col("t1") && col("tc") <= col("t1") + 86400000000L)
      .select(((col("tc") - col("t1")) / 1000000L).cast("double").as("lat_s"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_s, 0.5)"), 2).as("p50_s"),
        round(expr("percentile(lat_s, 0.9)"), 2).as("p90_s"),
        round(max(col("lat_s")), 2).as("max_s"))
  }

  val q139Sql: String =
    """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |c1 AS (SELECT user_id, min(epoch_us(ts)) AS tc FROM events
      |       WHERE event_type = 'click' GROUP BY user_id),
      |lat AS (SELECT (tc - t1)::DOUBLE / 1000000 AS lat_s
      |        FROM s1 JOIN c1 USING (user_id)
      |        WHERE tc > t1 AND tc <= t1 + 86400000000)
      |SELECT count(*) AS n_converted,
      |       round(quantile_cont(lat_s, 0.5), 2) AS p50_s,
      |       round(quantile_cont(lat_s, 0.9), 2) AS p90_s,
      |       round(max(lat_s), 2) AS max_s
      |FROM lat""".stripMargin

  // ---------------------------------------------------------------- q145: SCD Type-2 build
  /** Slowly-changing-dimension Type-2 build: the events changelog turned
    * into versioned validity intervals per (user_id, event_type) — each
    * change opens a version at its own timestamp and closes the previous
    * one (valid_to = next change, NULL = still current). q87's
    * latest-state keeps only the newest row; this is its history-keeping
    * sibling (ClickHouse models it with CollapsingMergeTree sign columns;
    * warehouse ETL calls it SCD2). One user-keyed window pass — the same
    * single shuffle as funnel/sequence ops; (ts, event_id) ordering makes
    * version numbers total and engine-invariant. At 100 TB the window
    * state per key is O(1) (lead/row_number stream the sorted run). */
  def q145Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("version"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("event_type"), col("version"))
  }

  val q145Sql: String =
    """SELECT user_id, event_type,
      |       row_number() OVER w AS version,
      |       ts AS valid_from,
      |       lead(ts) OVER w AS valid_to,
      |       (lead(ts) OVER w IS NULL) AS is_current,
      |       round(value, 2) AS value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |ORDER BY user_id, event_type, version""".stripMargin

  // ---------------------------------------------------------------- q146: Gini concentration
  /** Gini coefficient of per-user activity within each event type — the
    * inequality measure next to q110's HHI (HHI weighs big shares, Gini
    * reads the whole Lorenz curve). Computed from the rank identity
    * G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted counts —
    * every term an exact 64-bit integer, one final double division
    * (< 2⁵³, engine-identical). Tie order can't matter: equal x values
    * swap ranks without changing Σi·xᵢ — which is exactly why the rank
    * never needs materializing per user. Σi·x comes from the VALUE
    * HISTOGRAM (q193's construction): per (type, x) tie-group of c users
    * starting at 0-based rank `pre`, the ranks are pre+1…pre+c, so
    * Σi = c·pre + c(c+1)/2 in closed form. The per-type prefix window
    * runs over the (type, distinct-activity) histogram — bounded by the
    * activity-value resolution (power-law: ≪ users), never user-grain,
    * so no skewed per-type rank task exists at any corpus size. The
    * data-sized step stays the one map-side-combined (type, user) count. */
  def q146Gini(s: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("x"))
    val hist = cnts.groupBy(col("event_type"), col("x")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
    hist
      .withColumn("pre", sum(col("c")).over(w) - col("c"))
      .groupBy(col("event_type"))
      // rank-sum terms widen to DECIMAL(38,0) (q130's fix for the same
      // class): at ~1e9 users × 1e10 events the Long products pass 2^63 —
      // ANSI overflow — while 38 digits hold to ~1e38; DuckDB's HUGEINT
      // sums match. EVERY multiply gets a decimal factor BEFORE it runs:
      // not just x·(rank factor) but the rank factor's own c·pre and
      // c·(c+1) terms, which at n ~ 1e10 rows per (type, x) group reach
      // ~1e20 in Long. c·(c+1) is even, so the /2 is exact at scale 6 and
      // the cast back to scale 0 is lossless. (tot stays Long: x·c counts
      // events of one tie-group, bounded by the type's event count.)
      .agg(sum(col("c")).as("n"), sum(col("x") * col("c")).as("tot"),
        sum(col("x").cast("decimal(38,0)") *
          (col("c").cast("decimal(38,0)") * col("pre") +
           (col("c").cast("decimal(38,0)") * (col("c") + lit(1L)) / lit(2))
             .cast("decimal(38,0)")))
          .as("ix"))
      .select(col("event_type"), col("n"), col("tot"),
        round((lit(2L) * col("ix") - (col("n") + lit(1L)) * col("tot").cast("decimal(38,0)"))
          .cast("double")
          / (col("n").cast("decimal(38,0)") * col("tot")).cast("double"), 4).as("gini"))
      .orderBy(col("event_type"))
  }

  val q146Sql: String =
    """WITH c AS (SELECT event_type, user_id, count(*) AS x FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, x,
      |             row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i
      |      FROM c)
      |SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS tot,
      |       round((2 * sum(i * x) - (count(*) + 1) * sum(x))::DOUBLE
      |             / (count(*) * sum(x))::DOUBLE, 4) AS gini
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q190: PSI drift (numeric distribution, time split)
  /** Population stability index between the month's two halves, per
    * event type — the numeric-distribution drift monitor a training
    * pipeline runs on feature columns between dataset versions (q104 is
    * the categorical twin via TV distance; q130's KS test is the
    * hypothesis-test view; PSI is the banded score ops teams threshold
    * at 0.1/0.25). Design for determinism + scale: FIXED integer bins
    * (floor(value/25), capped at 10 — 11 bands) so binning is one
    * map-side expression, never a quantile pass; Laplace (+1) smoothing
    * so empty cells are defined; the full type×bin grid (k·11 rows,
    * broadcast) so both engines sum over the identical cell set; every
    * ln argument is a ratio of exact BIGINT products. One corpus
    * aggregate → cell table; everything after is grid-sized. */
  def q190PsiDrift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"),
      // clamp BOTH ends: without greatest(…, 0) a negative value lands in
      // a bin below the 0-10 grid and silently vanishes from its half's
      // total (consistent across engines, so the gate would stay green
      // while rows disappear from the distribution)
      greatest(least(floor(col("value") / 25).cast("long"), lit(10L)), lit(0L)).as("bin"),
      when(col("ts") < to_timestamp(lit("2024-01-16")), 1L).otherwise(0L).as("h"))
    val cells = e.groupBy(col("event_type"), col("bin"))
      .agg(sum(col("h")).as("c1"), sum(lit(1L) - col("h")).as("c2"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(s.range(0, 11).select(col("id").as("bin"))))
    val f = grid.join(cells, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("c1"), lit(0L)).as("c1"), coalesce(col("c2"), lit(0L)).as("c2"))
    val n = f.groupBy(col("event_type"))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    f.join(broadcast(n), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(round(sum(
        ((col("c1") + 1).cast("double") / (col("n1") + 11) -
         (col("c2") + 1).cast("double") / (col("n2") + 11)) *
        log(((col("c1") + 1) * (col("n2") + 11)).cast("double") /
            ((col("c2") + 1) * (col("n1") + 11)))), 6).as("psi"))
      .orderBy(col("event_type"))
  }

  val q190Sql: String =
    """WITH e AS (SELECT event_type,
      |             greatest(least(CAST(floor(value / 25) AS BIGINT), 10), 0) AS bin,
      |             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS h
      |           FROM events),
      |g AS (SELECT DISTINCT event_type FROM e),
      |bins AS (SELECT unnest(range(0, 11)) AS bin),
      |grid AS (SELECT event_type, bin FROM g CROSS JOIN bins),
      |c AS (SELECT event_type, bin, sum(h)::BIGINT AS c1,
      |             sum(1 - h)::BIGINT AS c2
      |      FROM e GROUP BY 1, 2),
      |f AS (SELECT grid.event_type, grid.bin,
      |             coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
      |      FROM grid LEFT JOIN c ON c.event_type = grid.event_type
      |                           AND c.bin = grid.bin),
      |n AS (SELECT event_type, sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2
      |      FROM f GROUP BY 1)
      |SELECT f.event_type,
      |  round(sum(((c1 + 1)::DOUBLE / (n1 + 11) - (c2 + 1)::DOUBLE / (n2 + 11)) *
      |            ln(((c1 + 1) * (n2 + 11))::DOUBLE / ((c2 + 1) * (n1 + 11)))), 6)
      |    AS psi
      |FROM f JOIN n ON n.event_type = f.event_type
      |GROUP BY f.event_type ORDER BY f.event_type""".stripMargin

  // ---------------------------------------------------------------- q192: activity trend slope (grouped OLS)
  /** Per-type linear activity trend over the month — the grouped-OLS
    * drift detector (q109's CUSUM finds level SHIFTS, q178's seasonal
    * index finds periodicity; the slope finds steady growth/decay, the
    * signal a data-sourcing team alerts on). Thousands of tiny
    * regressions in ONE aggregate pass: y = events/day, x = day index,
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) where every Σ is an exact
    * BIGINT of integer counts — the only float is the final division,
    * rounded. The day table is |types|×31; nothing after the first
    * aggregate is corpus-sized. Missing days count as zero via the
    * broadcast type×day grid (skipping them would bias the fit). */
  def q192TrendSlope(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("x"))
      .agg(count(lit(1)).as("y"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(s.range(1, 32).select(col("id").as("x"))))
    grid.join(daily, Seq("event_type", "x"), "left")
      .select(col("event_type"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("sy").as("n_events"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope_per_day"))
      .orderBy(col("event_type"))
  }

  val q192Sql: String =
    """WITH d AS (SELECT event_type, CAST(day(ts) AS BIGINT) AS x,
      |             count(*)::BIGINT AS y
      |           FROM events GROUP BY 1, 2),
      |g AS (SELECT DISTINCT event_type FROM d),
      |days AS (SELECT unnest(range(1, 32)) AS x),
      |grid AS (SELECT event_type, x FROM g CROSS JOIN days),
      |f AS (SELECT grid.event_type, grid.x, coalesce(y, 0) AS y
      |      FROM grid LEFT JOIN d ON d.event_type = grid.event_type
      |                           AND d.x = grid.x),
      |a AS (SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
      |             sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
      |             sum(x * x)::BIGINT AS sxx
      |      FROM f GROUP BY 1)
      |SELECT event_type, sy AS n_events,
      |  round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx), 6)
      |    AS slope_per_day
      |FROM a ORDER BY event_type""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q190_psi_drift",         q190PsiDrift _,        Some(q190Sql)),
    ("q192_trend_slope",       q192TrendSlope _,      Some(q192Sql)),
    ("q82_gap_fill",  q82GapFill _,   Some(q82Sql)),
    ("q83_funnel",    q83Funnel _,    Some(q83Sql)),
    ("q198_funnel_sweep", q198FunnelSweep _, Some(q198Sql)),
    ("q84_retention", q84Retention _, Some(q84Sql)),
    ("q86_sequence_match", q86SequenceMatch _, Some(q86Sql)),
    ("q152_sequence_count", q152SequenceCount _, Some(q152Sql)),
    ("q173_funnel_strict",  q173FunnelStrict _,  Some(q173Sql)),
    ("q156_audience_growth", q156AudienceGrowth _, Some(q156Sql)),
    ("q157_interpolate",     q157Interpolate _,    Some(q157Sql)),
    ("q158_decile_lift",     q158DecileLift _,     Some(q158Sql)),
    ("q162_seq_pairs",       q162SeqPairs _,       Some(q162Sql)),
    ("q87_latest_state",   q87LatestState _,   Some(q87Sql)),
    ("q97_max_intersections", q97MaxIntersections _, Some(q97Sql)),
    ("q98_attribution",       q98Attribution _,      Some(q98Sql)),
    ("q99_anomaly",           q99Anomaly _,          Some(q99Sql)),
    ("q101_ema",              q101Ema _,             Some(q101Sql)),
    ("q102_counter_rate",     q102CounterRate _,     Some(q102Sql)),
    ("q103_time_weighted_avg", q103TimeWeightedAvg _, Some(q103Sql)),
    ("q121_group_array",       q121GroupArray _,      Some(q121Sql)),
    ("q124_burst_collapse",    q124BurstCollapse _,   Some(q124Sql)),
    ("q133_path_triples",      q133PathTriples _,     Some(q133Sql)),
    ("q134_rfm_segments",      q134RfmSegments _,     Some(q134Sql)),
    ("q135_cohort_ltv",        q135CohortLtv _,       Some(q135Sql)),
    ("q137_conversion_matrix", q137ConversionMatrix _, Some(q137Sql)),
    ("q138_forward_fill",      q138ForwardFill _,      Some(q138Sql)),
    ("q139_funnel_latency",    q139FunnelLatency _,    Some(q139Sql)),
    ("q145_scd2",              q145Scd2 _,             Some(q145Sql)),
    ("q146_gini",              q146Gini _,             Some(q146Sql)),
  )
}

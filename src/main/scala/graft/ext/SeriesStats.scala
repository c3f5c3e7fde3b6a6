package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Time-series statistics over the events table — the diagnostic family a
  * log-analytics sink is queried for once rollups exist (the reference
  * delegates all querying to ClickHouse, README.md:9-10; these are the
  * ClickHouse-style series functions re-expressed as declarative plans).
  *
  * Scale design: every operator aggregates raw events down to the
  * per-(type, day) or per-(type, user) grain FIRST — one shuffle keyed on
  * the series entity with map-side partial aggregation — then runs the
  * statistic on the tiny series table. Day-grain series are ~365 rows per
  * type per year regardless of raw volume, so the window passes after the
  * first aggregation are free at any scale. Statistics that need a float
  * accumulation are derived from EXACT integer running sums wherever
  * cross-engine determinism matters (q109), or from single-pass co-moment
  * aggregates that both engines define identically (q107).
  */
object SeriesStats {

  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  // ---------------------------------------------------------------- q107: lag autocorrelation
  /** Lag-1 autocorrelation of each event type's daily-count series —
    * "is yesterday's volume predictive of today's?". One shuffle to the
    * day grain, a lag window over the ~150-row series, and a single-pass
    * Pearson `corr` co-moment aggregate (identical definition in Spark
    * and DuckDB, q45 precedent). */
  def q107Autocorr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily(s, dir)
      .withColumn("n_prev", lag(col("n"), 1).over(w))
      .filter(col("n_prev").isNotNull)
      .groupBy(col("event_type"))
      // NaN→NULL: Spark corr yields NaN on degenerate series (one pair,
      // or zero variance) where DuckDB yields NULL — normalize for the
      // oracle gate and for sane downstream filters
      .agg(corr(col("n"), col("n_prev")).as("c"),
           count(lit(1)).as("n_pairs"))
      .select(col("event_type"),
        when(isnan(col("c")), lit(null)).otherwise(round(col("c"), 4))
          .as("autocorr_1d"),
        col("n_pairs"))
      .orderBy(col("event_type"))
  }

  val q107Sql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, n,
      |             lag(n) OVER (PARTITION BY event_type ORDER BY day) AS n_prev
      |      FROM d)
      |SELECT event_type, round(corr(n, n_prev), 4) AS autocorr_1d,
      |       count(*) AS n_pairs
      |FROM l WHERE n_prev IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q108: Markov transitions
  /** First-order event-type transition matrix: for each user's event
    * sequence (ts order, event_id tie-break), count src→dst adjacencies
    * and normalize per src row. The lead window shuffles raw events once
    * on user_id (the natural session key — same partitioning q83/q86
    * reuse); the transition matrix itself is |types|² rows. */
  def q108Markov(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    trans
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))), 4))
      .orderBy(col("src"), col("dst"))
  }

  val q108Sql: String =
    """WITH seq AS (SELECT event_type AS src,
      |                    lead(event_type) OVER (PARTITION BY user_id
      |                                           ORDER BY ts, event_id) AS dst
      |             FROM events),
      |c AS (SELECT src, dst, count(*) AS n FROM seq
      |      WHERE dst IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |       round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 4) AS p
      |FROM c ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------- q109: CUSUM changepoint
  /** CUSUM changepoint screen on each type's daily-count series: the
    * deviation of the running total from the uniform-rate line,
    * D_k = S_k − k·T/K (S_k = exact integer running sum, T/K = overall
    * mean). The day whose |D_k| is maximal is the best single
    * changepoint (max-CUSUM statistic). All accumulation is over exact
    * BIGINTs — the only float ops are one multiply/divide per row from
    * integer inputs, so Spark and DuckDB agree bit-for-bit (no
    * order-dependent float summation, unlike a naive z-score cusum). */
  def q109Cusum(s: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    daily(s, dir)
      .withColumn("k", row_number().over(wSeq))
      .withColumn("s_k", sum(col("n")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", sum(col("n")).over(wAll))
      .withColumn("kk", count(lit(1)).over(wAll))
      .withColumn("dev", round(col("s_k").cast("double") -
        col("k").cast("double") * col("t").cast("double") / col("kk").cast("double"), 4))
      .withColumn("is_cp",
        when(abs(col("dev")) === max(abs(col("dev"))).over(wAll), 1).otherwise(0))
      .select(col("event_type"), col("day"), col("n"), col("dev"), col("is_cp"))
      .orderBy(col("event_type"), col("day"))
  }

  val q109Sql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |cum AS (SELECT event_type, day, n,
      |               row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
      |               sum(n) OVER (PARTITION BY event_type ORDER BY day
      |                            ROWS UNBOUNDED PRECEDING) AS s_k,
      |               sum(n) OVER (PARTITION BY event_type) AS t,
      |               count(*) OVER (PARTITION BY event_type) AS kk
      |        FROM d),
      |dev AS (SELECT event_type, day, n,
      |               round(s_k::DOUBLE - k::DOUBLE * t::DOUBLE / kk::DOUBLE, 4) AS dev
      |        FROM cum)
      |SELECT event_type, day, n, dev,
      |       CASE WHEN abs(dev) = max(abs(dev)) OVER (PARTITION BY event_type)
      |            THEN 1 ELSE 0 END AS is_cp
      |FROM dev ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q110: concentration (HHI)
  /** Herfindahl–Hirschman concentration of event volume across users per
    * type — "is this stream dominated by a few actors?". Two cascaded
    * hash aggregations: raw→(type,user) counts (the only raw-data
    * shuffle), then (type,user)→type sum-of-squared-shares. Shares come
    * from exact integer counts; HHI sums |users| small doubles — at 4dp
    * the engines agree (q45/q58 precedent for rounded float aggs). */
  def q110Hhi(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    perUser
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .withColumn("share", col("n").cast("double") / col("tot").cast("double"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
           round(sum(col("share") * col("share")), 4).as("hhi"),
           round(max(col("share")), 4).as("top_share"))
      .orderBy(col("event_type"))
  }

  val q110Sql: String =
    """WITH u AS (SELECT event_type, user_id, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |sh AS (SELECT event_type,
      |              n::DOUBLE / sum(n) OVER (PARTITION BY event_type) AS share
      |       FROM u)
      |SELECT event_type, count(*) AS n_users,
      |       round(sum(share * share), 4) AS hhi,
      |       round(max(share), 4) AS top_share
      |FROM sh GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q125: rolling distinct (sliding uniq)
  /** Rolling 7-day distinct users per day — "rolling WAU", ClickHouse's
    * sliding `uniq`. COUNT(DISTINCT) over a window frame isn't a thing
    * in any engine, and re-scanning 7 days per day is 7× waste; instead
    * each (user, active-day) pair — already deduped, the heavy shuffle —
    * is exploded to the ≤7 trailing report days it covers, then one
    * distinct + count per report day. Expansion is 7×|user-days|
    * (entity-grain, not event-grain); the exact distinct is the anchor,
    * per-day HLL sketch UNION (approx_count_distinct partials) is the
    * 100 TB swap. Report days are clipped to the observed range so
    * every emitted day has a full-width window's worth of data behind
    * it (days < min+6 are partial by nature and still emitted — the
    * range filter only stops phantom days past max). */
  def q125RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d")).distinct()
    val bounds = ud.agg(max(col("d")).as("hi"))
    ud.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("d"), least(col("hi"),
          col("d") + expr("INTERVAL 6 DAYS")), expr("INTERVAL 1 DAY"))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      .orderBy(col("day"))
  }

  val q125Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
      |            FROM events),
      |b AS (SELECT max(d) AS hi FROM ud),
      |cover AS (SELECT DISTINCT ud.user_id,
      |                 ud.d + INTERVAL (g.i) DAY AS day
      |          FROM ud CROSS JOIN b
      |               CROSS JOIN (SELECT unnest(range(0, 7)) AS i) g
      |          WHERE ud.d + INTERVAL (g.i) DAY <= b.hi)
      |SELECT day, count(*) AS wau FROM cover
      |GROUP BY day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q127: audience overlap (bitmap algebra)
  /** Pairwise audience overlap between event types — ClickHouse's
    * groupBitmap/bitmapAndCardinality family, done relationally: the
    * deduped (type, user) membership table self-joins on user to count
    * co-members, and per-type cardinalities turn that into Jaccard. No
    * per-group set materialization: the membership table IS the bitmap,
    * partitioned by user — the one shuffle co-locates each user's
    * type-list, and |types|²-sized output falls out of a hash aggregate.
    * At 100 TB the self-join is Σ_user |types(u)|² ≤ |types|·|members| —
    * linear in membership, never in events. */
  def q127AudienceOverlap(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
    m.persist()
    try {
      val card = m.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val inter = m.as("a")
        .join(m.withColumnRenamed("event_type", "t2").as("b"), Seq("user_id"))
        .filter(col("event_type") < col("t2"))
        .groupBy(col("event_type").as("t1"), col("t2"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(broadcast(card.withColumnRenamed("event_type", "t1")
          .withColumnRenamed("n", "n1")), Seq("t1"))
        .join(broadcast(card.withColumnRenamed("event_type", "t2")
          .withColumnRenamed("n", "n2")), Seq("t2"))
        .select(col("t1"), col("t2"), col("n_both"), col("n1"), col("n2"),
          round(col("n_both").cast("double") /
            (col("n1") + col("n2") - col("n_both")), 4).as("jaccard"))
        .orderBy(col("t1"), col("t2"))
        .localCheckpoint(true)
    } finally m.unpersist(false)
  }

  val q127Sql: String =
    """WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
      |card AS (SELECT event_type, count(*) AS n FROM m GROUP BY 1),
      |inter AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
      |          FROM m a JOIN m b ON a.user_id = b.user_id
      |                            AND a.event_type < b.event_type
      |          GROUP BY 1, 2)
      |SELECT t1, t2, n_both, c1.n AS n1, c2.n AS n2,
      |       round(n_both::DOUBLE / (c1.n + c2.n - n_both), 4) AS jaccard
      |FROM inter JOIN card c1 ON c1.event_type = t1
      |           JOIN card c2 ON c2.event_type = t2
      |ORDER BY t1, t2""".stripMargin

  // ---------------------------------------------------------------- q128: Welch t-test
  /** Two-sample Welch t-test (ClickHouse `welchTTest`): does purchase
    * value differ from view value? Both cohorts reduce to (n, mean,
    * sample variance) in ONE pass over the scan (conditional aggregates,
    * q18's trick — no second cohort scan, no join), then the t statistic
    * and Welch–Satterthwaite df are a handful of scalar ops. The moment
    * aggregates are the same single-pass co-moments as q45 (precedent
    * for 4dp engine agreement); everything after is arithmetic on six
    * scalars, identical in any engine. */
  def q128WelchTTest(s: SparkSession, dir: String): DataFrame = {
    val isA = col("event_type") === "purchase"
    val isB = col("event_type") === "view"
    val m = Tables.events(s, dir)
      .filter(isA || isB)
      .agg(
        count(when(isA, 1)).as("n1"),
        avg(when(isA, col("value"))).as("m1"),
        var_samp(when(isA, col("value"))).as("v1"),
        count(when(isB, 1)).as("n2"),
        avg(when(isB, col("value"))).as("m2"),
        var_samp(when(isB, col("value"))).as("v2"))
    val se1 = col("v1") / col("n1")
    val se2 = col("v2") / col("n2")
    m.select(
        col("n1"), col("n2"),
        round(col("m1") - col("m2"), 4).as("mean_diff"),
        round((col("m1") - col("m2")) / sqrt(se1 + se2), 4).as("t_stat"),
        round(pow(se1 + se2, 2) /
          (pow(se1, 2) / (col("n1") - 1) + pow(se2, 2) / (col("n2") - 1)), 2)
          .as("welch_df"))
  }

  val q128Sql: String =
    """WITH m AS (
      |  SELECT count(*) FILTER (event_type = 'purchase') AS n1,
      |         avg(value) FILTER (event_type = 'purchase') AS m1,
      |         var_samp(value) FILTER (event_type = 'purchase') AS v1,
      |         count(*) FILTER (event_type = 'view') AS n2,
      |         avg(value) FILTER (event_type = 'view') AS m2,
      |         var_samp(value) FILTER (event_type = 'view') AS v2
      |  FROM events WHERE event_type IN ('purchase', 'view'))
      |SELECT n1, n2, round(m1 - m2, 4) AS mean_diff,
      |       round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) AS t_stat,
      |       round(pow(v1/n1 + v2/n2, 2)
      |             / (pow(v1/n1, 2) / (n1 - 1) + pow(v2/n2, 2) / (n2 - 1)), 2)
      |         AS welch_df
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q129: chi-square independence
  /** χ² test of independence between event type and day-of-week — "is
    * the weekly traffic shape the same for every event type?". One
    * count aggregation to the |types|×7 contingency table; marginals
    * come from windows over that tiny table and the statistic is
    * Σ(o−e)²/e over exact integer counts (e is the only division).
    * The categorical drift screen next to q104's TV distance. */
  def q129ChiSquare(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("o"))
    // FULL contingency grid, not just observed cells: an empty (type,dow)
    // cell still contributes (0−e)²/e = e to the statistic — dropping it
    // understates χ² whenever the table is sparse
    val cell = counts.select(col("event_type")).distinct()
      .crossJoin(counts.select(col("dow")).distinct())
      .join(counts, Seq("event_type", "dow"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val wT = Window.partitionBy(col("event_type"))
    val wD = Window.partitionBy(col("dow"))
    val wAll = Window.partitionBy()
    cell
      .withColumn("rt", sum(col("o")).over(wT))
      .withColumn("ct", sum(col("o")).over(wD))
      .withColumn("tot", sum(col("o")).over(wAll))
      .withColumn("e", col("rt").cast("double") * col("ct") / col("tot"))
      .agg(
        countDistinct(col("event_type")).as("nt"),
        countDistinct(col("dow")).as("nd"),
        round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"))
      .select(((col("nt") - 1) * (col("nd") - 1)).as("dof"), col("chi2"))
  }

  /** Day-of-week labels differ between engines (Spark 1-7, DuckDB 0-6)
    * but χ² and dof are label-invariant — the cells partition
    * identically either way, so no re-labeling is needed. */
  val q129Sql: String =
    """WITH counts AS (SELECT event_type, dayofweek(ts) AS dow, count(*) AS o
      |                FROM events GROUP BY 1, 2),
      |cell AS (SELECT t.event_type, d.dow, coalesce(c.o, 0) AS o
      |         FROM (SELECT DISTINCT event_type FROM counts) t
      |         CROSS JOIN (SELECT DISTINCT dow FROM counts) d
      |         LEFT JOIN counts c ON c.event_type = t.event_type AND c.dow = d.dow),
      |m AS (SELECT o,
      |             sum(o) OVER (PARTITION BY event_type) AS rt,
      |             sum(o) OVER (PARTITION BY dow) AS ct,
      |             sum(o) OVER () AS tot,
      |             event_type, dow
      |      FROM cell)
      |SELECT CAST((count(DISTINCT event_type) - 1)
      |            * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
      |       round(sum(pow(o - rt::DOUBLE * ct / tot, 2)
      |                 / (rt::DOUBLE * ct / tot)), 4) AS chi2
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q130: Kolmogorov–Smirnov test
  /** Two-sample KS statistic (ClickHouse `kolmogorovSmirnovTest`) between
    * purchase and view values — the standard distribution-drift check
    * between two slices. D = sup|F₁−F₂| computed EXACTLY: per distinct
    * value, cumulative counts (integers), and the sup as
    * max|cum1·n₂ − cum2·n₁| / (n₁·n₂) — an integer numerator, so both
    * engines agree bit-for-bit before the one final division. The global
    * value-ordered window runs over the distinct-value table; at 100 TB
    * that's a range-partitioned sort with per-partition offsets (q97's
    * block-offset sweep pattern), not a single-partition window. */
  def q130KsTest(s: SparkSession, dir: String): DataFrame = {
    val isA = col("event_type") === "purchase"
    val counts = Tables.events(s, dir)
      .filter(isA || col("event_type") === "view")
      .groupBy(col("value"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("c1"),
           sum(when(isA, 0L).otherwise(1L)).as("c2"))
    val wv = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum1", sum(col("c1")).over(wv))
      .withColumn("cum2", sum(col("c2")).over(wv))
      .withColumn("n1", sum(col("c1")).over(Window.partitionBy()))
      .withColumn("n2", sum(col("c2")).over(Window.partitionBy()))
      // DECIMAL(38) products: cum·n reaches n1·n2, which wraps Long past
      // ~3e9-row cohorts (DuckDB's HUGEINT doesn't) — widen so the
      // integer-exactness claim holds at the scale the doc promises
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
           max(abs(col("cum1").cast("decimal(38,0)") * col("n2") -
                   col("cum2").cast("decimal(38,0)") * col("n1"))).as("num"))
      // a global agg still emits one all-null row on empty input; the
      // oracle's GROUP BY emits none — align
      .filter(col("n1").isNotNull)
      .select(col("n1"), col("n2"),
        round(col("num").cast("double") /
          (col("n1").cast("decimal(38,0)") * col("n2")).cast("double"), 6)
          .as("ks_d"))
  }

  val q130Sql: String =
    """WITH e AS (SELECT value, event_type = 'purchase' AS is1
      |           FROM events WHERE event_type IN ('purchase', 'view')),
      |c AS (SELECT value,
      |             sum(CASE WHEN is1 THEN 1 ELSE 0 END) AS c1,
      |             sum(CASE WHEN is1 THEN 0 ELSE 1 END) AS c2
      |      FROM e GROUP BY value),
      |cum AS (SELECT sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum1,
      |               sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum2
      |        FROM c),
      |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |             CAST(sum(c2) AS BIGINT) AS n2 FROM c)
      |SELECT n1, n2,
      |       round(max(abs(cum1 * n2 - cum2 * n1))::DOUBLE / (n1 * n2), 6) AS ks_d
      |FROM cum CROSS JOIN t GROUP BY n1, n2""".stripMargin

  // ---------------------------------------------------------------- q142: block jackknife
  /** Block-jackknife standard error of the mean purchase value — THE
    * distributed error-bar method (resampling without replacement =
    * leave-one-block-out, no RNG): users hash into 10 deterministic
    * blocks, each block's leave-out mean comes from exact integer
    * (cents, count) totals, and the jackknife variance is
    * (B−1)/B·Σ(θ̄₍ᵦ₎−θ̄)². One keyed aggregation to 10 rows; everything
    * after is scalar arithmetic on exact integers. The uncertainty
    * number a mean without an error bar is missing at any scale. */
  def q142BlockJackknife(s: SparkSession, dir: String): DataFrame = {
    val blocks = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy((col("user_id") % 10).as("b"))
      .agg(sum(round(col("value") * 100).cast("long")).as("sc"),
           count(lit(1)).as("n"))
    val tot = blocks.agg(sum(col("sc")).as("ts"), sum(col("n")).as("tn"),
      count(lit(1)).as("nb"))
    val loo = blocks.crossJoin(broadcast(tot))
      .withColumn("loo_mean",
        (col("ts") - col("sc")).cast("double") / (col("tn") - col("n")) / 100.0)
    val meanLoo = loo.agg(
      (sum(col("loo_mean")) / count(lit(1))).as("mloo"),
      max(col("nb")).as("nb"), max(col("ts")).as("ts"), max(col("tn")).as("tn"))
    loo.crossJoin(broadcast(meanLoo.select(col("mloo"))))
      .agg(
        max(col("tn")).as("n_purchases"),
        max(col("nb")).as("n_blocks"),
        round(max(col("ts")).cast("double") / max(col("tn")) / 100.0, 4)
          .as("mean_value"),
        round(sqrt(
          (max(col("nb")) - 1).cast("double") / max(col("nb")) *
          sum(pow(col("loo_mean") - col("mloo"), 2))), 4).as("jackknife_se"))
  }

  val q142Sql: String =
    """WITH blocks AS (
      |  SELECT user_id % 10 AS b,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
      |         count(*) AS n
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |tot AS (SELECT CAST(sum(sc) AS BIGINT) AS ts, CAST(sum(n) AS BIGINT) AS tn,
      |               count(*) AS nb FROM blocks),
      |loo AS (SELECT b.sc, b.n, t.ts, t.tn, t.nb,
      |               (t.ts - b.sc)::DOUBLE / (t.tn - b.n) / 100.0 AS loo_mean
      |        FROM blocks b CROSS JOIN tot t),
      |m AS (SELECT sum(loo_mean) / count(*) AS mloo FROM loo)
      |SELECT max(l.tn) AS n_purchases, max(l.nb) AS n_blocks,
      |       round(max(l.ts)::DOUBLE / max(l.tn) / 100.0, 4) AS mean_value,
      |       round(sqrt((max(l.nb) - 1)::DOUBLE / max(l.nb)
      |                  * sum(pow(l.loo_mean - m.mloo, 2))), 4) AS jackknife_se
      |FROM loo l CROSS JOIN m""".stripMargin

  // ---------------------------------------------------------------- q149: log-bucket percentile sketch
  /** Power-of-two histogram percentiles over per-user inter-event gaps —
    * the DDSketch/HdrHistogram idea made fully deterministic and
    * oracle-checkable: bucket b holds gaps in [2^b, 2^(b+1)), so any
    * quantile read off the cumulative bucket counts is the true quantile
    * up to a bounded 2× relative error, and unlike q39/q69's sketches
    * the answer is a pure function of the data (no RNG, no merge-order
    * dependence — buckets are exact counts, trivially mergeable). The
    * percentile estimate is the crossing bucket's upper bound 2^(b+1)−1:
    * all-integer arithmetic end to end. floor(log2(gap)) is computed as
    * length(bin(gap))−1 — no floating-point log at bucket boundaries.
    * Scale: the gap pass is one (user,type)-keyed window; bucket counts
    * collapse to |types|×64 rows via map-side combine — THE mergeable
    * latency-histogram shape ops dashboards use at any volume. */
  def q149LogHistogram(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap").isNotNull)
      .select(col("event_type"),
        when(col("gap") <= 0, lit(-1))
          .otherwise(length(bin(col("gap"))) - 1).as("bkt"))
    val counts = gaps.groupBy(col("event_type"), col("bkt")).agg(count(lit(1)).as("n"))
    val cw = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
    val tw = Window.partitionBy(col("event_type"))
    counts
      .withColumn("cum", sum(col("n")).over(cw))
      .withColumn("tot", sum(col("n")).over(tw))
      .groupBy(col("event_type"))
      .agg(max(col("tot")).as("n_gaps"),
        min(when(col("cum") * 2 >= col("tot"), expr("shiftleft(cast(1 as bigint), bkt + 1) - 1"))).as("p50_us"),
        min(when(col("cum") * 10 >= col("tot") * 9, expr("shiftleft(cast(1 as bigint), bkt + 1) - 1"))).as("p90_us"),
        min(when(col("cum") * 100 >= col("tot") * 99, expr("shiftleft(cast(1 as bigint), bkt + 1) - 1"))).as("p99_us"))
      .orderBy(col("event_type"))
  }

  val q149Sql: String =
    """WITH g AS (
      |  SELECT event_type,
      |         epoch_us(ts) - lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
      |  FROM events),
      |b AS (SELECT event_type,
      |             CASE WHEN gap <= 0 THEN -1
      |                  ELSE length(format('{:b}', gap)) - 1 END AS bkt
      |      FROM g WHERE gap IS NOT NULL),
      |c AS (SELECT event_type, bkt, count(*) AS n FROM b GROUP BY 1, 2),
      |cum AS (SELECT event_type, bkt,
      |               sum(n) OVER (PARTITION BY event_type ORDER BY bkt) AS cum,
      |               sum(n) OVER (PARTITION BY event_type) AS tot, n
      |        FROM c)
      |SELECT event_type, CAST(max(tot) AS BIGINT) AS n_gaps,
      |  CAST(min(CASE WHEN cum * 2 >= tot THEN (1::BIGINT << (bkt + 1)) - 1 END) AS BIGINT) AS p50_us,
      |  CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN (1::BIGINT << (bkt + 1)) - 1 END) AS BIGINT) AS p90_us,
      |  CAST(min(CASE WHEN cum * 100 >= tot * 99 THEN (1::BIGINT << (bkt + 1)) - 1 END) AS BIGINT) AS p99_us
      |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q164: OHLC candles
  /** OHLC candle aggregation — per hour: open (earliest value), high,
    * low, close (latest value), volume. The metrics/finance downsampling
    * primitive, done as ONE partial+final aggregate pass: open/close are
    * lexicographic argmin/argmax structs on (ts, event_id) (q87's
    * pattern), NOT a window sort — the shuffle carries one candle per
    * (hour, partial) and the candle stream is calendar-sized at any
    * input volume. */
  def q164Ohlc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("volume"))
      .select(col("h"),
        round(col("o.value"), 2).as("open"), round(col("high"), 2).as("high"),
        round(col("low"), 2).as("low"), round(col("c.value"), 2).as("close"),
        col("volume"))
      .orderBy(col("h"))

  val q164Sql: String =
    """SELECT date_trunc('hour', ts) AS h,
      |  round(min(struct_pack(ts := ts, eid := event_id, v := value)).v, 2) AS open,
      |  round(max(value), 2) AS high,
      |  round(min(value), 2) AS low,
      |  round(max(struct_pack(ts := ts, eid := event_id, v := value)).v, 2) AS close,
      |  count(*) AS volume
      |FROM events GROUP BY 1 ORDER BY h""".stripMargin

  // ---------------------------------------------------------------- q166: Spearman drift screen
  /** Spearman rank correlation between event value and event time per
    * type — the nonparametric drift screen: any monotone value drift
    * shows up as |ρ| → 1 even when nonlinear, which Pearson on raw
    * values (q45) misses. Average-rank tie handling:
    * avg_rank = rank + (ties−1)/2 — half-integers are exact in doubles,
    * and the final Pearson co-moment over the two rank columns is the
    * q45/q107-proven single-pass corr aggregate.
    *
    * Scale design: two event_type-partitioned window sorts (by value, by
    * time). With few types these partitions are corpus-sized — the 100 TB
    * swap is q165's histogram-rank formulation (value resolution is
    * bounded, so ranks come off a prefix sum over the value histogram;
    * time ranks off the store's sorted-by-time layout). */
  def q166Spearman(s: SparkSession, dir: String): DataFrame = {
    val wv = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("ts"))
    Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("ts"))
      .withColumn("rv", rank().over(wv) +
        (count(lit(1)).over(Window.partitionBy(col("event_type"), col("value"))) - 1) / 2.0)
      .withColumn("rt", rank().over(wt) +
        (count(lit(1)).over(Window.partitionBy(col("event_type"), col("ts"))) - 1) / 2.0)
      .groupBy(col("event_type"))
      .agg(corr(col("rv"), col("rt")).as("c"), count(lit(1)).as("n"))
      .select(col("event_type"),
        when(isnan(col("c")), lit(null)).otherwise(round(col("c"), 4)).as("rho"),
        col("n"))
      .orderBy(col("event_type"))
  }

  val q166Sql: String =
    """WITH r AS (
      |  SELECT event_type,
      |    rank() OVER (PARTITION BY event_type ORDER BY value)
      |      + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS rv,
      |    rank() OVER (PARTITION BY event_type ORDER BY epoch_us(ts))
      |      + (count(*) OVER (PARTITION BY event_type, epoch_us(ts)) - 1) / 2.0 AS rt
      |  FROM events)
      |SELECT event_type, round(corr(rv, rt), 4) AS rho, count(*)::BIGINT AS n
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q169: bitmap audience algebra
  /** Audience overlap through the BITMAP AGGREGATE surface (ClickHouse
    * groupBitmapState + bitmapAnd/OrCardinality — q127's semantics, the
    * state-type engine path): one corpus aggregation materializes each
    * type's membership as a serialized dense bitmap, then EVERY pairwise
    * question (all t1<t2, including empty intersections, which q127's
    * join formulation never sees) is a byte-AND/OR of two blobs on
    * |types|² driver-sized rows — no membership re-shuffle per question.
    * OR-merge is order-independent, so the cardinalities gate exactly
    * against the relational DuckDB oracle. [[graft.functions.BitmapAgg]]
    * has the state-bound and Roaring-swap scale notes. */
  def q169BitmapAudience(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapAgg
    val bm = Tables.events(s, dir)
      // the typed Aggregator's primitive-Long input cannot represent
      // NULL ids (q151's hazard, same guard)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(BitmapAgg.bitmap_state(col("user_id")).as("bm"))
      .localCheckpoint(true) // |types| rows feed both pair sides
    bm.as("a")
      .join(bm.select(col("event_type").as("t2"), col("bm").as("bm2")).as("b"),
        col("event_type") < col("t2"))
      .select(col("event_type").as("t1"), col("t2"),
        BitmapAgg.bitmap_cardinality(col("bm")).as("n1"),
        BitmapAgg.bitmap_cardinality(col("bm2")).as("n2"),
        BitmapAgg.bitmap_and_cardinality(col("bm"), col("bm2")).as("n_and"),
        BitmapAgg.bitmap_or_cardinality(col("bm"), col("bm2")).as("n_or"))
      .withColumn("jaccard", round(col("n_and").cast("double") / col("n_or"), 4))
      .orderBy(col("t1"), col("t2"))
  }

  val q169Sql: String =
    """WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
      |c AS (SELECT event_type, count(*)::BIGINT AS n FROM m GROUP BY 1),
      |i AS (SELECT a.event_type AS t1, b.event_type AS t2,
      |             count(*)::BIGINT AS n_and
      |      FROM m a JOIN m b
      |        ON a.user_id = b.user_id AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT c1.event_type AS t1, c2.event_type AS t2, c1.n AS n1, c2.n AS n2,
      |       coalesce(i.n_and, 0)::BIGINT AS n_and,
      |       (c1.n + c2.n - coalesce(i.n_and, 0))::BIGINT AS n_or,
      |       round(coalesce(i.n_and, 0)::DOUBLE /
      |             (c1.n + c2.n - coalesce(i.n_and, 0)), 4) AS jaccard
      |FROM c c1 JOIN c c2 ON c1.event_type < c2.event_type
      |LEFT JOIN i ON i.t1 = c1.event_type AND i.t2 = c2.event_type
      |ORDER BY t1, t2""".stripMargin

  // entries LAST: it captures the qNNNSql vals eagerly, so any Sql val
  // declared below it would still be null at object-init time
  // ---------------------------------------------------------------- seasonal index (dow profile)
  /** Day-of-week seasonal index per event type — the seasonality
    * decomposition step of capacity planning and anomaly baselining
    * (q99's z-score assumes one; this measures it). Index = 7·n/total:
    * 1.0 = flat, >1 = over-represented weekday. The weekday is computed
    * ARITHMETICALLY from the epoch-day number ((days+3) mod 7, Monday=0)
    * instead of any dow() builtin — engines disagree on week-start
    * numbering (q129 dodged this by being label-invariant; here the label
    * IS the output, so it must be derived portably). Counts map-side
    * combine to a 35-cell table; the index is integer half-up arithmetic
    * (q134's pattern), so the whole result is engine-exact. */
  def q178SeasonalIndex(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        (((datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) + 3) % 7)
          .cast("long")).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
    cells.join(tot, "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        (expr("(2 * 7 * n * 10000 + tot) DIV (2 * tot)") / 10000.0).as("idx"))
      .orderBy(col("event_type"), col("dow"))
  }

  val q178Sql: String =
    """WITH c AS (SELECT event_type,
      |            (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 AS dow,
      |            count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
      |SELECT c.event_type, c.dow, c.n,
      |       ((2 * 7 * c.n * 10000 + t.tot) // (2 * t.tot)) / 10000.0 AS idx
      |FROM c JOIN t ON t.event_type = c.event_type
      |ORDER BY c.event_type, c.dow""".stripMargin

  // ---------------------------------------------------------------- exponential time-decayed sum
  /** Freshness-weighted activity per event type (ClickHouse's
    * `exponentialTimeDecayed{Sum,Count}` family): weight 2^-Δdays from
    * the newest event day, clipped at 10 days. The half-life-one-day
    * base-2 decay is the DESIGN choice that makes a float aggregate
    * engine-exact: every weight is a dyadic rational (exactly
    * representable), every term floor(value)·2^-Δ fits the 52-bit
    * mantissa, so the sum is EXACT regardless of accumulation order —
    * no round() crutch, bit-identical across engines and task counts
    * (e^-λΔ weights would be irrational and order-sensitive). One
    * map-side-combined aggregate; the reference day is an O(1) collected
    * scalar (q82's rule). */
  def q180DecayedSum(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      to_date(col("ts")).as("day"), col("value"))
    val refRow = ev.agg(max(col("day"))).collect()(0)
    // empty slice must carry the NORMAL output schema (q138's bug class):
    // a 1-column early return breaks schema-sensitive consumers
    if (refRow.isNullAt(0))
      return ev.limit(0).select(col("event_type"),
        lit(0L).as("n_events"), lit(0.0).as("decayed_n"), lit(0.0).as("decayed_value"))
    val ref = lit(refRow.getDate(0))
    ev
      .withColumn("dlt", datediff(ref, col("day")))
      .withColumn("w", when(col("dlt") <= 10, pow(lit(2.0), -col("dlt")))
        .otherwise(lit(0.0)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("w")).as("decayed_n"),
        sum(floor(col("value")) * col("w")).as("decayed_value"))
      .orderBy(col("event_type"))
  }

  val q180Sql: String =
    """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events),
      |r AS (SELECT max(day) AS ref FROM ev),
      |w AS (SELECT event_type,
      |             CASE WHEN date_diff('day', day, ref) <= 10
      |                  THEN power(2.0, -date_diff('day', day, ref))
      |                  ELSE 0.0 END AS w,
      |             value
      |      FROM ev CROSS JOIN r)
      |SELECT event_type, count(*) AS n_events,
      |       sum(w) AS decayed_n,
      |       sum(floor(value) * w) AS decayed_value
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q193: equi-height histogram (ANALYZE primitive)
  /** Exact 10-bucket equi-height histogram of l_extendedprice — the
    * equi-DEPTH statistics primitive a CBO builds during ANALYZE (q90 is
    * the fixed-edge equi-WIDTH twin). The naive formulation is
    * `ntile(10) OVER (ORDER BY v)` — a single-partition global sort, the
    * one window shape banned at scale. This computes the identical
    * result from the VALUE HISTOGRAM instead: one corpus aggregate to
    * (v, cnt), a prefix sum over that resolution-bounded table for each
    * value's 0-based start rank, then exact integer overlap of each
    * value's rank span [minr, minr+cnt) with each ANSI ntile bucket
    * (first n%10 buckets sized n/10+1, rest n/10) — a value spans ≤
    * (cnt·10/n + 2) buckets, so the exploded table stays
    * histogram-sized. Per-bucket min/max/count/mean are invariant to
    * how ties split across a boundary (the bucket's value MULTISET is
    * fixed), which is exactly why the histogram construction can match
    * single-threaded ntile row-for-row. DuckDB's oracle IS the naive
    * ntile — the gate proves the distributed construction equals it. */
  def q193EquiHeight(s: SparkSession, dir: String): DataFrame = {
    // the value-grain running rank via the range-distributed prefix sum
    // (DistRank, the q123/q209 machinery — no groups, so the per-group
    // total IS the grand total n): the previous shape funneled the whole
    // price histogram (594k cells at sf0.1, unbounded at scale) through
    // ONE task via an unpartitioned `Window.orderBy(v)`, then paid a
    // separate total aggregate + broadcast cross join for n. Same
    // integers, zero WindowExec, n rides for free.
    val hist = graft.ext.DistRank.withGroupPrefixSum(
        Tables.lineitem(s, dir).select(col("l_extendedprice").as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("cnt")),
        Seq.empty, "cnt", Seq(col("v")), "cum", "n")
      .withColumn("minr", col("cum") - col("cnt"))
    def bucketOf(rank: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(rank < (q + 1) * r, (rank / (q + 1)).cast("long"))
        .otherwise(r + ((rank - (q + 1) * r) / q).cast("long"))
    val spans = hist
      .withColumn("q", expr("n DIV 10")).withColumn("r", expr("n % 10"))
      .withColumn("bLo", bucketOf(col("minr"), col("q"), col("r")))
      .withColumn("bHi", bucketOf(col("minr") + col("cnt") - 1, col("q"), col("r")))
      .withColumn("b", explode(sequence(col("bLo"), col("bHi"))))
      .withColumn("start", col("b") * col("q") + least(col("b"), col("r")))
      .withColumn("size", col("q") + when(col("b") < col("r"), 1L).otherwise(0L))
      .withColumn("overlap",
        least(col("minr") + col("cnt"), col("start") + col("size")) -
        greatest(col("minr"), col("start")))
    spans.groupBy(col("b"))
      .agg(sum(col("overlap")).as("n_rows"),
           min(col("v")).as("v_min"), max(col("v")).as("v_max"),
           round(sum(col("v") * col("overlap")) / sum(col("overlap")), 4).as("v_avg"))
      .select((col("b") + 1).as("bucket"), col("n_rows"),
        col("v_min"), col("v_max"), col("v_avg"))
      .orderBy(col("bucket"))
  }

  val q193Sql: String =
    """WITH t AS (SELECT l_extendedprice AS v,
      |             ntile(10) OVER (ORDER BY l_extendedprice) AS bucket
      |           FROM lineitem)
      |SELECT bucket, count(*)::BIGINT AS n_rows, min(v) AS v_min,
      |  max(v) AS v_max, round(avg(v), 4) AS v_avg
      |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q199: LTTB downsampling
  /** Largest-Triangle-Three-Buckets series downsampling (ClickHouse's
    * `largestTriangleThreeBuckets`): per event type, reduce the daily
    * series to k=10 visually-representative points — endpoints fixed, the
    * middle n−2 points split into k−2 buckets, each bucket contributing
    * the point maximizing the triangle area against the PREVIOUSLY
    * selected point and the NEXT bucket's average (the last middle bucket
    * targets the final point). All-integer: x is the epoch day, y the
    * exact count, and the area comparison is scaled by the next bucket's
    * count (positive, constant within a bucket — argmax-preserving), so
    * every comparison is BIGINT and ties (smallest x) are engine-exact.
    * Series with n ≤ k pass through whole, as in ClickHouse.
    *
    * Scale: the corpus collapses to the day grain in one map-side-combined
    * aggregate; the sequential greedy chain (selection b depends on b−1)
    * then runs per SERIES inside one typed flatMap over the assembled,
    * calendar-bounded point array — mirroring ClickHouse, whose lttb
    * aggregate state also holds the series' points. No window operator
    * anywhere: ordering comes from sort_array on the bounded array. */
  def q199LttbDownsample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 10
    val pts = Tables.events(s, dir)
      .groupBy(col("event_type"),
        datediff(to_date(date_trunc("day", col("ts"))), lit("1970-01-01").cast("date"))
          .cast("long").as("x"))
      .agg(count(lit(1)).as("y"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("x").as("_1"), col("y").as("_2")))).as("pts"))
      .as[(String, Seq[(Long, Long)])]
    pts.flatMap { case (t, ps) => lttb(ps.toIndexedSeq, k).map(p => (t, p._1, p._2)) }
      .toDF("event_type", "x", "y")
      .orderBy(col("event_type"), col("x"))
  }

  /** The integer LTTB chain over one (sorted) series — bounded input, run
    * once per series. Package-private for the property spec. */
  private[ext] def lttb(ps: IndexedSeq[(Long, Long)], k: Int): Seq[(Long, Long)] = {
    val n = ps.length
    if (n <= k) return ps
    val first = ps.head
    val last = ps.last
    val m = n - 2
    val nb = k - 2
    val buckets = (0 until m).groupBy(i => i * nb / m)
      .view.mapValues(_.map(i => ps(i + 1))).toMap
    var prev = first
    val sel = scala.collection.mutable.ArrayBuffer(first)
    for (b <- 0 until nb) {
      val (nsx, nsy, nc) =
        if (b + 1 < nb) {
          val nx = buckets(b + 1)
          (nx.map(_._1).sum, nx.map(_._2).sum, nx.size.toLong)
        } else (last._1, last._2, 1L)
      prev = buckets(b).minBy { case (x, y) =>
        val a2 = math.abs((prev._1 * nc - nsx) * (y - prev._2) - (prev._1 - x) * (nsy - prev._2 * nc))
        (-a2, x)
      }
      sel += prev
    }
    (sel += last).toSeq
  }

  val q199Sql: String =
    """WITH RECURSIVE
      |daily AS (
      |  SELECT event_type,
      |         date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))::BIGINT AS x,
      |         count(*)::BIGINT AS y
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
      |idx AS (SELECT d.event_type, d.x, d.y, s.n,
      |               row_number() OVER (PARTITION BY d.event_type ORDER BY d.x) - 1 AS i
      |        FROM daily d JOIN st s USING (event_type)),
      |small AS (SELECT event_type, x, y FROM idx WHERE n <= 10),
      |firstpt AS (SELECT event_type, x, y FROM idx WHERE n > 10 AND i = 0),
      |lastpt  AS (SELECT event_type, x, y FROM idx WHERE n > 10 AND i = n - 1),
      |mid AS (SELECT event_type, x, y, ((i - 1) * 8) // (n - 2) AS b
      |        FROM idx WHERE n > 10 AND i >= 1 AND i <= n - 2),
      |bsum AS (SELECT event_type, b, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |               count(*)::BIGINT AS c
      |         FROM mid GROUP BY 1, 2),
      |nbs AS (SELECT m.event_type, m.b,
      |               coalesce(nx.sx, l.x) AS nsx, coalesce(nx.sy, l.y) AS nsy,
      |               coalesce(nx.c, 1) AS nc
      |        FROM (SELECT DISTINCT event_type, b FROM mid) m
      |        LEFT JOIN bsum nx ON nx.event_type = m.event_type AND nx.b = m.b + 1
      |        JOIN lastpt l ON l.event_type = m.event_type),
      |rec AS (
      |  SELECT event_type, -1 AS b, x AS px, y AS py FROM firstpt
      |  UNION ALL
      |  SELECT r.event_type, r.b + 1, m.x, m.y
      |  FROM rec r
      |  JOIN nbs nb ON nb.event_type = r.event_type AND nb.b = r.b + 1
      |  JOIN mid m ON m.event_type = r.event_type AND m.b = r.b + 1
      |  WHERE r.b + 1 <= 7
      |    AND NOT EXISTS (
      |      SELECT 1 FROM mid m2
      |      WHERE m2.event_type = m.event_type AND m2.b = m.b AND (
      |        abs((r.px * nb.nc - nb.nsx) * (m2.y - r.py) - (r.px - m2.x) * (nb.nsy - r.py * nb.nc)) >
      |        abs((r.px * nb.nc - nb.nsx) * (m.y  - r.py) - (r.px - m.x)  * (nb.nsy - r.py * nb.nc))
      |        OR (abs((r.px * nb.nc - nb.nsx) * (m2.y - r.py) - (r.px - m2.x) * (nb.nsy - r.py * nb.nc)) =
      |            abs((r.px * nb.nc - nb.nsx) * (m.y  - r.py) - (r.px - m.x)  * (nb.nsy - r.py * nb.nc))
      |            AND m2.x < m.x)))
      |)
      |SELECT event_type, x, y FROM small
      |UNION ALL SELECT event_type, px AS x, py AS y FROM rec
      |UNION ALL SELECT event_type, x, y FROM lastpt
      |ORDER BY event_type, x""".stripMargin

  // ---------------------------------------------------------------- q208: series codec round-trip
  /** Block-codec round-trip over the events stream — the query-level gate
    * for the reference store's per-column `CODEC(...)` declarations
    * (trace-converter.py:86 stores Severity as `CODEC(Delta, ZSTD)`):
    * granule-sized blocks (≤8192 rows) of time-sorted events are encoded
    * with the three native codecs — timestamps DoubleDelta (fixed cadence
    * → ~1 B/value), gauge doubles Gorilla-XOR, ids Delta — then decoded
    * back THROUGH THE CATALYST EXPRESSIONS (`dd_dec`/`gorilla_dec`/
    * `delta_dec`, codegen'd) and re-aggregated. The oracle computes the
    * same aggregates from raw rows, so any lossy bit anywhere in the
    * encode→decode pipeline (varint frames, zigzag wraparound, XOR
    * window reuse) breaks n / min / max / the mod-prime checksums.
    * Scale: one range shuffle on (type, time) — the realistic archive
    * layout, skew-free because a hot type spreads across ranges — then
    * the encode is partition-local with constant (granule-bounded)
    * memory; decode is map-only; the final aggregate map-side combines.
    * Blocks never span what matters: every aggregate is blocking- and
    * partitioning-invariant, so the result is deterministic while block
    * boundaries are free to follow the data layout. Bit-exactness of the
    * codecs themselves (NaN payloads, ±0.0, Long overflow) is pinned in
    * `CodecSpec`. */
  def q208CodecRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{CodecKernels, Codecs}
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"),
        col("value"), col("event_id"))
    val blocks = ev
      .repartitionByRange(col("event_type"), col("tus"))
      .sortWithinPartitions("event_type", "tus", "event_id")
      .as[(String, Long, Double, Long)]
      .mapPartitions { rows =>
        val granule = 8192
        val it = rows.buffered
        new Iterator[(String, Array[Byte], Array[Byte], Array[Byte])] {
          def hasNext: Boolean = it.hasNext
          def next(): (String, Array[Byte], Array[Byte], Array[Byte]) = {
            val typ = it.head._1
            val ts = Array.newBuilder[Long]
            val vs = Array.newBuilder[Double]
            val ids = Array.newBuilder[Long]
            var n = 0
            while (it.hasNext && n < granule && it.head._1 == typ) {
              val r = it.next(); ts += r._2; vs += r._3; ids += r._4; n += 1
            }
            (typ, CodecKernels.ddEncodeLongs(ts.result()),
              CodecKernels.gorillaEncodeDoubles(vs.result()),
              CodecKernels.deltaEncodeLongs(ids.result()))
          }
        }
      }
      .toDF("event_type", "ts_enc", "val_enc", "id_enc")
    blocks
      .select(col("event_type"),
        Codecs.dd_dec(col("ts_enc")).as("tus"),
        Codecs.gorilla_dec(col("val_enc")).as("value"),
        Codecs.delta_dec(col("id_enc")).as("event_id"))
      .select(col("event_type"),
        explode(arrays_zip(col("tus"), col("value"), col("event_id"))).as("r"))
      .select(col("event_type"), col("r.tus").as("tus"),
        col("r.value").as("value"), col("r.event_id").as("event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("tus")).as("ts_min"), max(col("tus")).as("ts_max"),
        sum(col("tus") % lit(1000003L)).as("ts_mod_sum"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"),
        sum(col("event_id") % lit(1000003L)).as("id_mod_sum"))
      .orderBy(col("event_type"))
  }

  val q208Sql: String =
    """SELECT event_type, count(*) AS n,
      |       min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max,
      |       CAST(sum(epoch_us(ts) % 1000003) AS BIGINT) AS ts_mod_sum,
      |       min(value) AS v_min, max(value) AS v_max,
      |       CAST(sum(event_id % 1000003) AS BIGINT) AS id_mod_sum
      |FROM events
      |WHERE ts IS NOT NULL AND value IS NOT NULL
      |  AND event_id IS NOT NULL AND event_type IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q208_codec_roundtrip", q208CodecRoundtrip _, Some(q208Sql)),
    ("q199_lttb_downsample", q199LttbDownsample _, Some(q199Sql)),
    ("q193_equiheight_hist", q193EquiHeight _, Some(q193Sql)),
    ("q107_autocorr", q107Autocorr _, Some(q107Sql)),
    ("q178_seasonal_index", q178SeasonalIndex _, Some(q178Sql)),
    ("q180_decayed_sum",    q180DecayedSum _,    Some(q180Sql)),
    ("q149_log_histogram", q149LogHistogram _, Some(q149Sql)),
    ("q164_ohlc",          q164Ohlc _,         Some(q164Sql)),
    ("q108_markov",   q108Markov _,   Some(q108Sql)),
    ("q109_cusum",    q109Cusum _,    Some(q109Sql)),
    ("q110_hhi",      q110Hhi _,      Some(q110Sql)),
    ("q125_rolling_distinct", q125RollingDistinct _, Some(q125Sql)),
    ("q127_audience_overlap", q127AudienceOverlap _, Some(q127Sql)),
    ("q169_bitmap_audience",  q169BitmapAudience _,  Some(q169Sql)),
    ("q166_spearman",         q166Spearman _,        Some(q166Sql)),
    ("q128_welch_ttest",      q128WelchTTest _,      Some(q128Sql)),
    ("q129_chi_square",       q129ChiSquare _,       Some(q129Sql)),
    ("q130_ks_test",          q130KsTest _,          Some(q130Sql)),
    ("q142_block_jackknife",  q142BlockJackknife _,  Some(q142Sql)),
  )
}

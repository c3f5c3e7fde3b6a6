package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Tier B OLAP operators (SURVEY.md §2 B1–B10 + the §2 category checklist:
  * joins, aggregations, rollup, window functions, sorts/limits, set ops,
  * scalar functions).
  *
  * The reference (thoughtpolice/fdblog2clickhouse) delegates all of these to
  * ClickHouse — its MergeTree layout (`trace-converter.py:22-24`: partition
  * by month, order by time) exists to serve exactly these query shapes
  * (`README.md:9-10`). Here they execute natively on Spark.
  *
  * Scale notes (100 TB discipline):
  *  - filters/projections are declared first so Catalyst pushes them into
  *    the parquet scan (PushedFilters / ReadSchema);
  *  - dimension joins broadcast the small side explicitly;
  *  - fact-fact joins shuffle on the join key and rely on AQE for skew;
  *  - aggregations are plain groupBy → HashAggregateExec partial+final
  *    (map-side combine), no driver-side collects anywhere.
  *
  * Every query ends in a total ORDER BY with a unique-key tiebreak and
  * rounds floating aggregates, so the DuckDB-oracle hash compare is
  * deterministic (SURVEY.md §7.4).
  */
object CoreQueries {

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  // ---------------------------------------------------------------- B1/B4
  /** Time-range + dimension predicate scan. At scale the table is stored
    * partitioned by month and sorted by ts (see graft.store.TraceStore), so
    * the time predicate prunes partitions and row-groups; both predicates
    * are pushed to parquet.
    */
  def q01TimeFilter(s: SparkSession, dir: String): DataFrame =
    Tables.eventsInRange(s, dir, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  val q01Sql: String =
    """SELECT event_id, ts, user_id, value FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |  AND event_type = 'error'
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------- B2
  /** Sorted range scan over the fact table's clustering key
    * (l_shipdate stands in for the reference's ORDER BY (Time),
    * trace-converter.py:24): parquet min/max row-group stats skip
    * out-of-range groups when the data is written time-sorted. */
  def q02RangeScan(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00") &&
              col("l_shipdate") <  ts("1999-01-01 00:00:00"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
              col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------------------------- B3/B5
  /** Month bucketing (the reference's toYYYYMM, trace-converter.py:23) +
    * hash aggregation. Partial aggregation happens map-side; only
    * (month × type) groups shuffle. */
  def q03MonthRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyyMM").as("ym"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("ym"), col("event_type"))

  val q03Sql: String =
    """SELECT strftime(ts, '%Y%m') AS ym, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------- B4/B5
  /** Dimension-predicate filter + hash aggregation (B4): equality and range predicates on dimension columns reach the parquet scan as pushed filters. */
  def q04DimFilterAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value") >= 10)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("event_type"))

  val q04Sql: String =
    """SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
      |FROM events WHERE value >= 10 GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------- B5
  /** TPC-H Q1 shape: the canonical OLAP pricing-summary aggregate.
    * One shuffle on the (tiny) group key; everything else map-side. */
  def q05PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("2000-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q05Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------------- B6/B9
  /** Daily rollup (materialized-view shape, README.md:231-236) with an
    * exact distinct. count(distinct) expands to a two-phase aggregate —
    * fine here; at 100 TB prefer q38's approx_count_distinct (HLL++). */
  def q06DailyRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .orderBy(col("day"), col("event_type"))

  val q06Sql: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  count(*) AS n, count(DISTINCT user_id) AS users
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------- B7
  /** Tumbling time-window aggregation via the built-in window() operator —
    * the same operator drives streaming rollups (graft.streaming). */
  def q07HourlyWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"))

  val q07Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** SLIDING time-window aggregation (B7's second form — §2 checklist
    * "tumbling/sliding/session"): 2-hour windows advancing hourly, so
    * each event lands in exactly two windows. Spark's window() expands
    * size/slide windows per row before the aggregate (one Expand + one
    * grouped shuffle); the same expression runs under a watermark in
    * streaming. Oracle: enumerate each event's two window starts. */
  def q89SlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
      .orderBy(col("w_start"))

  val q89Sql: String =
    """WITH w AS (SELECT date_trunc('hour', ts) - (o * INTERVAL 1 HOUR) AS w_start, value
      |           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o) t
      |           WHERE event_type = 'error')
      |SELECT w_start, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM w GROUP BY w_start ORDER BY w_start""".stripMargin

  // ------------------------------------------------------------------- B8
  /** Top-N: orderBy + limit compiles to TakeOrderedAndProjectExec —
    * per-partition top-N then a single driver merge of N×partitions rows,
    * never a global sort. */
  def q08TopN(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val q08Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ------------------------------------------------------------------- B9
  /** Exact distinct users per event type (B9): the two-phase distinct — partial per-partition dedup, then a keyed exchange. */
  def q09DistinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q09Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------- B10
  /** Star-schema dimension enrichment (the reference's "dictionaries" TODO,
    * README.md:231-233). All three dims are broadcast — zero shuffle of the
    * fact table; this is the plan shape that survives 100 TB. */
  def q10StarJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy(col("r_name"))

  val q10Sql: String =
    """SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS rev
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ------------------------------------------------------------------- B10/B5
  /** Fact-fact join (lineitem ⋈ orders shuffles on orderkey; AQE handles
    * skew) + broadcast dims; revenue per nation. */
  def q11RevenueByNation(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  val q11Sql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------------- joins: semi
  /** EXISTS ≡ left_semi join: no payload columns from the right side ever
    * shuffle, and the build side deduplicates — strictly cheaper than
    * join+distinct. */
  def q12SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q12Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------- joins: anti
  /** Customers with no high-value order (left_anti ≡ NOT EXISTS). The
    * filter on the right side is applied before the join build, so only
    * qualifying keys are shuffled/broadcast. */
  def q13AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
              .filter(col("o_totalprice") > 450000)
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  val q13Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------- set ops
  /** UNION DISTINCT then EXCEPT — both are hash-aggregates on the single
    * projected column, so only distinct user_ids shuffle. */
  def q14SetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def ids(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    ids("error").union(ids("signup")).distinct()
      .except(ev.filter(col("event_type") === "purchase" && col("value") >= 200)
                .select(col("user_id")))
      .orderBy(col("user_id"))
  }

  val q14Sql: String =
    """(SELECT user_id FROM events WHERE event_type = 'error'
      | UNION
      | SELECT user_id FROM events WHERE event_type = 'signup')
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'purchase' AND value >= 200
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------- window: ranking
  /** Ranking window: top-3 orders per customer. Shuffles once on the
    * partition key; at scale prefer pre-filtering with a per-partition
    * top-N (TakeOrdered) when K≪group size. */
  def q15RankPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q15Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ------------------------------------------------------------------- window: analytic frame
  /** Running sum + lag over a per-user ordered frame. The frame is ordered
    * by (ts, event_id) so the cumulative double accumulates in the same
    * order in both engines → exact hash match after rounding. */
  def q16RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("running",
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"), col("running"), col("prev_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q16Sql: String =
    """SELECT user_id, event_id, value,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------- rollup / grouping sets
  /** ROLLUP(event_type, month): hierarchical subtotals in one pass
    * (Expand + single hash aggregate). NULL group labels are coalesced to
    * 'ALL' on both sides so ordering is engine-independent. */
  def q17Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("ym0", date_format(col("ts"), "yyyyMM"))
      .rollup(col("event_type"), col("ym0"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(coalesce(col("event_type"), lit("ALL")).as("et"),
              coalesce(col("ym0"), lit("ALL")).as("ym"),
              col("n"), col("sv"))
      .orderBy(col("et"), col("ym"))

  val q17Sql: String =
    """SELECT coalesce(event_type, 'ALL') AS et, coalesce(ym0, 'ALL') AS ym,
      |  count(*) AS n, round(sum(value), 2) AS sv
      |FROM (SELECT event_type, strftime(ts, '%Y%m') AS ym0, value FROM events) t
      |GROUP BY ROLLUP(event_type, ym0)
      |ORDER BY et, ym""".stripMargin

  // ------------------------------------------------------------------- conditional agg
  /** Conditional (pivot-style) aggregation: one scan, one shuffle, N
    * measures — the scalable alternative to N self-joins. */
  def q18CaseAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 2).as("purchase_value"),
        count(when(col("event_type") === "error", lit(1))).as("errors"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  val q18Sql: String =
    """SELECT user_id,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
      |  count(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------- having
  /** Post-aggregation predicate (HAVING): the filter runs on aggregated rows, never the fact table. */
  def q19Having(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("n"))
      .filter(col("qty") > 300)
      .orderBy(col("l_partkey"))

  val q19Sql: String =
    """SELECT l_partkey, round(sum(l_quantity), 2) AS qty, count(*) AS n
      |FROM lineitem GROUP BY l_partkey
      |HAVING round(sum(l_quantity), 2) > 300 ORDER BY l_partkey""".stripMargin

  // ------------------------------------------------------------------- scalar string fns
  /** Scalar string functions — all codegen'd builtins, no UDFs, so they
    * stay inside WholeStageCodegen. */
  def q20StringFns(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("pfx"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        when(col("p_type") === "PROMO", lit(1)).otherwise(lit(0)).as("is_promo"))
      .orderBy(col("p_partkey"))

  val q20Sql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name) AS name_len,
      |  substr(p_name, 1, 8) AS pfx, replace(p_name, ' ', '_') AS snake,
      |  CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------------- B9 at scale
  /** HLL++ approximate distinct — the 100 TB replacement for q09's exact
    * countDistinct. Sketch estimates differ across engines, so the gated
    * output is the GUARANTEE, not the estimate: the exact count plus a
    * boolean `within_bound` (relative error ≤ 5% at rsd 0.01 — 5σ).
    * DuckDB's oracle emits the same exact count with `within_bound =
    * true`, so the row hashes match iff the sketch honored its bound.
    * The exact leg exists only as the audit; production runs the sketch
    * alone. */
  def q39ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
           countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users") <= lit(0.05)).as("within_bound"))
      .orderBy(col("event_type"))

  val q39Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  true AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Materialized sketch rollup — the B6×B9 composition that matters at
    * 100 TB: per-type HLL sketch STATES (datasketches binary blobs, the
    * AggregatingMergeTree pattern from the reference's rollup TODO,
    * README.md:231-236) are stored once, and the coarser global grain is
    * answered by UNIONING the states — `hll_union_agg` over |types|
    * blobs — without rescanning the corpus. The q39 guarantee gate
    * applies: emit the exact global distinct (audit leg) plus the
    * verdict that the union-of-sketches estimate lands within 5 %
    * (lgK 14 → RSE ≈ 0.8 %, so the bound is ≈ 6σ). */
  def q186SketchRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val perType = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val fromStates = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("est"))
    val exactG = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    fromStates.join(broadcast(exactG)) // both 1-row frames
      .select(col("exact_users"),
        (abs(col("est") - col("exact_users")).cast("double")
          / col("exact_users") <= lit(0.05)).as("within_bound"))
  }

  val q186Sql: String =
    """SELECT count(DISTINCT user_id) AS exact_users, true AS within_bound
      |FROM events""".stripMargin

  /** Theta-sketch set-operation overlap (ClickHouse `uniqTheta` with
    * intersect) — the sketch family's SET-ALGEBRA member: HLL (q39/q186)
    * unions but cannot intersect; theta sketches support
    * union/intersection/difference, which is what audience-overlap
    * questions need at 100 TB where the exact q127/q169 passes stop
    * fitting. Per-type sketches build in ONE `mapPartitions` pass (a
    * hash-map of UpdateSketches per task — the two-phase pattern;
    * partials are ≤ P·|types| compact blobs), union+intersect on the
    * driver over the bounded blob set, and the estimate is gated like
    * q39/q186: the exact pairwise overlap (one (type,user) dedup +
    * type-grain self-join — q127's construction) rides along, plus a
    * within-bound verdict. At audit scale the sketch is in exact mode
    * (< 2^lgK distinct keys) so the estimate IS exact; at corpus scale
    * the theta relative-error contract applies and the exact leg is the
    * audit sample. */
  def q201ThetaOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.datasketches.theta.{Intersection, SetOperation, Sketches, UpdateSketch}
    val lgK = 12
    val ev = Tables.events(s, dir)
    val partials = ev.select(col("event_type"), col("user_id")).as[(String, Long)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (t, u) =>
          m.getOrElseUpdate(t, UpdateSketch.builder().setLogNominalEntries(lgK).build())
            .update(u)
        }
        m.iterator.map { case (t, sk) => (t, sk.compact().toByteArray) }
      }.collect() // bounded: ≤ partitions × |types| compact blobs
    val byType = partials.groupBy(_._1).view.mapValues { blobs =>
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      blobs.foreach { case (_, b) => u.union(Sketches.wrapSketch(org.apache.datasketches.memory.Memory.wrap(b))) }
      u.getResult
    }.toMap
    val types = byType.keys.toSeq.sorted
    val est = for {
      (t1, i) <- types.zipWithIndex
      t2 <- types.drop(i + 1)
    } yield {
      val in: Intersection = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
      in.intersect(byType(t1)); in.intersect(byType(t2))
      (t1, t2, in.getResult.getEstimate)
    }
    val estDf = est.toDF("t1", "t2", "theta_est")
    val tu = ev.select(col("event_type"), col("user_id")).distinct()
    val exact = tu.as("a")
      .join(tu.as("b"),
        col("b.user_id") === col("a.user_id") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("exact_overlap"))
    exact.join(broadcast(estDf), Seq("t1", "t2"))
      .select(col("t1"), col("t2"), col("exact_overlap"),
        (abs(col("theta_est") - col("exact_overlap"))
          / greatest(col("exact_overlap"), lit(1L)) <= lit(0.05)).as("within_bound"))
      .orderBy(col("t1"), col("t2"))
  }

  val q201Sql: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
      |SELECT a.event_type AS t1, b.event_type AS t2,
      |       count(*) AS exact_overlap, true AS within_bound
      |FROM tu a JOIN tu b ON b.user_id = a.user_id AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Quantile sketch with a RANK-error guarantee gate — the fifth
    * mergeable-sketch member (HLL q39, MG q69, CMS q181, HLL-union
    * q186; here the ClickHouse quantileTDigest analogue). The
    * `approx_percentile` VALUE is engine-private, but its contract is a
    * rank bound: with accuracy parameter B the answer's true rank must
    * lie within 1/B of the target. So the gated row per group is the
    * exact median (audit leg) plus a verdict computed entirely in
    * Spark. The sketch returns an actual data VALUE, whose rank is the
    * whole tie interval [|{v < apx}|, |{v ≤ apx}|] / n — the contract
    * holds iff that interval INTERSECTS [0.5 − ε, 0.5 + ε], ε = 2/B
    * (checking only |{v ≤ apx}| would fail a correct answer whose
    * returned value is heavily tied). DuckDB emits the same exact medians
    * asserting the verdict. The audited median is the DOUBLED median in
    * integer cents (= the exact a+b of the two middle elements): the
    * interpolated (a+b)/2 can land on a half-cent whose 2-decimal
    * rounding differs between engines, while ×2 recovers a+b exactly
    * (power-of-two scaling is FP-exact) and stays integer. One
    * aggregate pass computes the sketch; the rank check joins the
    * k-row answer back over a map-side count — corpus never shuffles
    * twice. */
  def q189QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("apx"),
           expr("CAST(2 * percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS BIGINT)")
             .as("median_cents_x2"),
           count(lit(1)).as("n"))
    val rank = li.join(broadcast(approx.select(col("l_returnflag").as("rf"), col("apx"))),
        col("l_returnflag") === col("rf"))
      .groupBy(col("rf"))
      .agg(sum(when(col("l_extendedprice") < col("apx"), 1L).otherwise(0L)).as("n_lt"),
           sum(when(col("l_extendedprice") <= col("apx"), 1L).otherwise(0L)).as("n_le"))
    approx.join(broadcast(rank), col("l_returnflag") === col("rf"))
      .select(col("l_returnflag"), col("median_cents_x2"),
        (col("n_lt").cast("double") / col("n") <= lit(0.502) &&
         col("n_le").cast("double") / col("n") >= lit(0.498))
          .as("within_rank_bound"))
      .orderBy(col("l_returnflag"))
  }

  val q189Sql: String =
    """SELECT l_returnflag,
      |  CAST(2 * quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS BIGINT)
      |    AS median_cents_x2,
      |  true AS within_rank_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Unpivot / melt — the inverse reshape of q41's pivot: the wide
    * per-returnflag metric row (sum_qty, sum_price, sum_disc) melts into
    * (flag, metric, value) long form, the shape metric stores and
    * plotting layers want. Spark's native `unpivot` keeps this a
    * zero-shuffle local expansion of the already-aggregated (3-row)
    * frame — the corpus-scale work is the one upstream aggregate. The
    * oracle uses UNION ALL (portable unpivot) over the same aggregate.
    * Values are pre-rounded BEFORE melting so both engines stringify the
    * same doubles into the shared `value` column. */
  def q187Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
           round(sum(col("l_extendedprice")), 2).as("sum_price"),
           round(sum(col("l_discount")), 2).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  val q187Sql: String =
    """WITH w AS (SELECT l_returnflag,
      |    round(sum(l_quantity), 2) AS sum_qty,
      |    round(sum(l_extendedprice), 2) AS sum_price,
      |    round(sum(l_discount), 2) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
      |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w
      |ORDER BY l_returnflag, metric""".stripMargin

  /** name → (query fn, oracle SQL). */
  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q01_time_filter",     q01TimeFilter _,     Some(q01Sql)),
    ("q02_range_scan",      q02RangeScan _,      Some(q02Sql)),
    ("q03_month_rollup",    q03MonthRollup _,    Some(q03Sql)),
    ("q04_dim_filter_agg",  q04DimFilterAgg _,   Some(q04Sql)),
    ("q05_pricing_summary", q05PricingSummary _, Some(q05Sql)),
    ("q06_daily_rollup",    q06DailyRollup _,    Some(q06Sql)),
    ("q07_hourly_window",   q07HourlyWindow _,   Some(q07Sql)),
    ("q89_sliding_window",  q89SlidingWindow _,  Some(q89Sql)),
    ("q08_topn",            q08TopN _,           Some(q08Sql)),
    ("q09_distinct_users",  q09DistinctUsers _,  Some(q09Sql)),
    ("q10_star_join",       q10StarJoin _,       Some(q10Sql)),
    ("q11_revenue_nation",  q11RevenueByNation _, Some(q11Sql)),
    ("q12_semi_join",       q12SemiJoin _,       Some(q12Sql)),
    ("q13_anti_join",       q13AntiJoin _,       Some(q13Sql)),
    ("q14_set_ops",         q14SetOps _,         Some(q14Sql)),
    ("q15_rank_per_group",  q15RankPerGroup _,   Some(q15Sql)),
    ("q16_running_sum",     q16RunningSum _,     Some(q16Sql)),
    ("q17_rollup",          q17Rollup _,         Some(q17Sql)),
    ("q18_case_agg",        q18CaseAgg _,        Some(q18Sql)),
    ("q19_having",          q19Having _,         Some(q19Sql)),
    ("q20_string_fns",      q20StringFns _,      Some(q20Sql)),
    ("q39_approx_distinct", q39ApproxDistinct _, Some(q39Sql)),
    ("q186_sketch_rollup",  q186SketchRollup _,  Some(q186Sql)),
    ("q201_theta_overlap",  q201ThetaOverlap _,  Some(q201Sql)),
    ("q187_unpivot",        q187Unpivot _,       Some(q187Sql)),
    ("q189_quantile_sketch", q189QuantileSketch _, Some(q189Sql)),
  )
}

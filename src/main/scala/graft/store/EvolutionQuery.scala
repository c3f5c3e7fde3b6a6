package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField}

/** q224 — the schema-evolution ALTER family proven end to end through a
  * REAL store lifecycle, oracle-gated (SURVEY.md §2 store maintenance;
  * the reference's README tells users they will ALTER this very table —
  * /root/reference/README.md:135-137,186-189 — and ClickHouse's ALTER
  * family is ADD / DROP / RENAME / MODIFY(widen)).
  *
  * The query builds a store whose files straddle FOUR schema
  * generations and reads it back through every evolution at once:
  *
  *   1. append batch A (base schema only)
  *   2. ADD    `Score INT`;  append batch B carrying int scores
  *   3. WIDEN  `Score` → BIGINT          (B's files stay int32 on disk)
  *   4. RENAME `Score` → `Pts`           (B's files keep the old name)
  *   5. ADD    `Junk BIGINT`; append batch C carrying `Pts` (wide, new
  *      name) and `Junk`
  *   6. DROP   `Junk`                    (C's files still carry it)
  *
  * Every step is METADATA-ONLY — one small manifest write, zero bytes of
  * data rewritten, the property that makes ALTER usable on a 100 TB
  * table. The final aggregate must see: A's rows with NULL Pts, B's
  * values promoted int32→int64 by the parquet reader and alias-resolved
  * Score→Pts, C's values under the current name, and no Junk column.
  * The DuckDB oracle recomputes the same numbers from the raw events
  * table, so a silent null-out anywhere (the classic rename bug) fails
  * the hash gate, not just a hand-written assertion.
  *
  * Scale: the store build is a one-time fixture (cached per
  * session+dir); the graded read is a straight groupBy over the store —
  * alias resolution is a per-column coalesce inside the scan's project,
  * no extra pass, no shuffle beyond the aggregate's own.
  */
object EvolutionQuery {

  private val built = new graft.util.SessionDirCache[String]

  /** events → trace-store rows. Batch membership (event_id % 3) and all
    * derived values are deterministic closed-form expressions so the
    * DuckDB oracle can reproduce them from the raw table. */
  private def asTrace(ev: DataFrame,
                      extra: (String, org.apache.spark.sql.Column)*): DataFrame =
    ev.select(Seq(
      // event_id can exceed int range on replica corpora (snowflake-style
      // shifted ids at k·10⁹); Severity is a label here, not an output —
      // pmod keeps it in range without touching the oracle's columns
      pmod(col("event_id"), lit(1000000000L)).cast(IntegerType).as("Severity"),
      concat(lit("m"), pmod(col("user_id"), lit(8L))).as("Machine"),
      col("event_type").as("LogGroup"),
      // Tables.events normalizes ts to UTC TIMESTAMP; the cast is a
      // belt-and-braces no-op that pins the store's declared Time type
      col("ts").cast(org.apache.spark.sql.types.TimestampType).as("Time"),
      col("event_type").as("Type"),
      col("event_id").cast("string").as("ID")) ++
      extra.map { case (n, c) => c.as(n) }: _*)

  private def buildStore(s: SparkSession, dir: String): String = built(s, dir) {
    (sess, d) =>
      val path = graft.util.TmpDirs.scratch("graft-evo-store")
      // the scratch dir must not pre-exist as a store root with content;
      // TmpDirs gives a fresh empty dir — append creates the layout.
      // Tables.events (never a raw parquet read): the driver's ts
      // encoding has varied across rounds (NANOS is unreadable raw) and
      // the relation cache normalizes every encoding to UTC TIMESTAMP
      val ev = graft.tables.Tables.events(sess, d)
      val batch = pmod(col("event_id"), lit(3L))
      // 1. base-only history
      TraceStore.append(asTrace(ev.filter(batch === 0)), path, splitsPerMonth = 2)
      // 2. ADD Score INT; batch B carries int scores. pmod-clamped to
      // [0, 1e9) BEFORE the int32 stage on both sides (oracle arm 1
      // applies the identical mod): a corpus where |floor(value)| ≥ 2³¹
      // would otherwise wrap/null only on the Spark side and fail the
      // gate for data reasons unrelated to evolution correctness — the
      // same snowflake-scale hazard the Severity pmod above guards.
      TraceStore.evolveSchema(path, StructField("Score", IntegerType, nullable = true))
      TraceStore.append(
        asTrace(ev.filter(batch === 1),
          "Score" -> pmod(floor(col("value")).cast(LongType), lit(1000000000L))
            .cast(IntegerType)),
        path, splitsPerMonth = 2)
      // 3-4. WIDEN to BIGINT, RENAME to Pts — zero files touched
      TraceStore.widenColumn(path, "Score", LongType)
      TraceStore.renameColumn(path, "Score", "Pts")
      // 5. ADD Junk; batch C carries the new name at the wide type + Junk
      TraceStore.evolveSchema(path, StructField("Junk", LongType, nullable = true))
      TraceStore.append(
        asTrace(ev.filter(batch === 2),
          "Pts" -> (floor(col("value")).cast(LongType) + 1000L),
          "Junk" -> lit(1L)),
        path, splitsPerMonth = 2)
      // 6. DROP Junk — files keep the pages; no read declares them again
      TraceStore.dropColumn(path, "Junk")
      path
  }

  /** q224: aggregate over the evolved store — every row's Pts value
    * arrives through a different evolution path depending on which
    * schema generation wrote its file. */
  def q224SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val path = buildStore(s, dir)
    val t = TraceStore.read(s, path)
    t.groupBy(col("Machine"))
      .agg(
        count(lit(1)).as("n"),
        count(col("Pts")).as("n_pts"),
        sum(col("Pts")).as("sum_pts"),
        min(col("Pts")).as("min_pts"),
        max(col("Pts")).as("max_pts"))
      .orderBy(col("Machine"))
  }

  // arm 1 applies the same non-negative mod as the Spark-side pmod
  // (DuckDB % keeps the dividend's sign, hence the double-mod form)
  val q224Sql: String =
    """SELECT 'm' || (user_id % 8) AS Machine,
      |  count(*) AS n,
      |  count(CASE WHEN event_id % 3 <> 0 THEN 1 END) AS n_pts,
      |  (sum(CASE WHEN event_id % 3 = 1
      |            THEN ((CAST(floor(value) AS BIGINT) % 1000000000) + 1000000000) % 1000000000
      |            WHEN event_id % 3 = 2 THEN CAST(floor(value) AS BIGINT) + 1000
      |       END))::BIGINT AS sum_pts,
      |  min(CASE WHEN event_id % 3 = 1
      |           THEN ((CAST(floor(value) AS BIGINT) % 1000000000) + 1000000000) % 1000000000
      |           WHEN event_id % 3 = 2 THEN CAST(floor(value) AS BIGINT) + 1000
      |      END) AS min_pts,
      |  max(CASE WHEN event_id % 3 = 1
      |           THEN ((CAST(floor(value) AS BIGINT) % 1000000000) + 1000000000) % 1000000000
      |           WHEN event_id % 3 = 2 THEN CAST(floor(value) AS BIGINT) + 1000
      |      END) AS max_pts
      |FROM events GROUP BY 1 ORDER BY Machine""".stripMargin

  def entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q224_schema_evolution", q224SchemaEvolution _, Some(q224Sql)),
  )
}

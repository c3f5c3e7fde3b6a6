package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Bucketed-table support for co-located fact-fact joins (builder prompt:
  * "repartition/bucketing for co-located joins").
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides. Writing both tables bucketed (and sorted) by the join key means
  * Spark's scan already satisfies the join's required distribution —
  * the SortMergeJoin runs with NO Exchange on either side (verified by
  * plan assertion in BucketingSpec). This is the Spark analogue of the
  * reference's MergeTree ORDER BY locality (trace-converter.py:24) applied
  * to join keys instead of scan keys.
  */
object Bucketing {

  /** Write df as a bucketed, per-bucket-sorted managed table.
    *
    * Robust against a stale warehouse: with the in-memory catalog a
    * fresh JVM does not know tables whose files survive in
    * spark-warehouse/ from a previous run, and `saveAsTable` then fails
    * with LOCATION_ALREADY_EXISTS instead of overwriting — so drop the
    * catalog entry AND clear the leftover location first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // managed-table layout is <warehouse>/<db>.db/<table> for any
    // database except default — a bare <warehouse>/<table> guess would
    // miss the stale location whenever the session did `USE somedb`
    val db = spark.catalog.currentDatabase
    val base = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val parent = if (db == "default") base
                 else new org.apache.hadoop.fs.Path(base, s"${db.toLowerCase}.db")
    val loc = new org.apache.hadoop.fs.Path(parent, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count on the join key. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Per-(session, dir) bucketed copies of lineitem/orders on the order
    * key — built once (the write is the co-location investment; every
    * subsequent fact-fact join on the key amortizes it), projected to
    * join + payload columns so the bucketed files store only what the
    * query family reads. */
  private val prepared = new graft.util.SessionDirCache[(String, String)]

  /** Collision-free catalog-safe tag for a dataset dir: sanitized path
    * (readable) + MD5 of the ORIGINAL path (sanitization is many-to-one
    * — "/a.b" and "/a_b" collapse — so the digest carries the identity;
    * a silent collision would cross-wire two datasets' tables). */
  private def dirTag(d: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    d.toLowerCase.replaceAll("[^a-z0-9]", "_").dropWhile(_ == '_') + "_" + digest
  }

  private def bucketedPair(s: SparkSession, dir: String): (String, String) =
    prepared(s, dir) { (sess, d) =>
      val tag = dirTag(d)
      val lt = s"graft_bucketed_lineitem_$tag"
      val ot = s"graft_bucketed_orders_$tag"
      writeBucketed(Tables.lineitem(sess, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        lt, "l_orderkey", 8)
      writeBucketed(Tables.orders(sess, d)
        .select(col("o_orderkey"), col("o_orderpriority")),
        ot, "o_orderkey", 8)
      (lt, ot)
    }

  // ---------------------------------------------------------------- q184: co-located fact-fact join
  /** Revenue by order priority through the BUCKETED layout: the lineitem⋈
    * orders join reads both sides pre-bucketed (and per-bucket sorted) on
    * the order key, so the scan satisfies the join's required
    * distribution and the join runs with no Exchange on either side
    * (BucketingSpec pins the plan; this entry gates the VALUES against
    * the plain-join oracle — same answer, co-located physical path).
    * At 100 TB this is the difference between shuffling two fact tables
    * per join and shuffling neither, for the cost of one bucketed write
    * amortized over every join on that key. */
  def q184BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = bucketedPair(s, dir)
    s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q184Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q185: partition pruning through a partitioned layout
  /** The reference's layout contract made visible end-to-end: its DDL
    * partitions the trace store by time bucket (`PARTITION BY
    * toYYYYMM(Time)`, trace-converter.py:23) purely so time predicates
    * skip partitions. Here events are laid out Hive-partitioned by DAY
    * (one month of data → day granularity keeps the demo non-vacuous:
    * 30 directories, the query reads 3) and the time predicate lands on
    * the partition column, so Catalyst's PruneFileSourcePartitions drops
    * 27/30 directories at PLANNING time — zero I/O, not even footer
    * reads (PartitionPruneSpec pins `PartitionFilters` and the
    * partition count; this entry gates the values against DuckDB over
    * the unpartitioned original). At 100 TB partition count is the
    * lever: day × source for a training corpus, low-thousands of
    * partitions, never high-cardinality keys. */
  private val partitioned = new graft.util.SessionDirCache[String]

  private def dayPartitionedEvents(s: SparkSession, dir: String): String =
    partitioned(s, dir) { (sess, d) =>
      val out = graft.util.TmpDirs.scratch("graft_events_byday")
      Tables.events(sess, d)
        .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
        .write.mode("overwrite").partitionBy("day").parquet(out)
      out
    }

  /** Partition pruning through a month-partitioned layout: the month predicate resolves to directory pruning at plan time, so the scan never lists out-of-range partitions. */
  def q185PartitionPrune(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dayPartitionedEvents(s, dir))
      .filter(col("day") >= "20240110" && col("day") <= "20240112")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v_sum"))
      .orderBy(col("event_type"))

  val q185Sql: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS v_sum
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q184_bucketed_join", q184BucketedJoin _, Some(q184Sql)),
    ("q185_partition_prune", q185PartitionPrune _, Some(q185Sql)),
  )
}

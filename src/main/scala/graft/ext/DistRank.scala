package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Exact distributed ranking — the scale-safe replacement for the
  * single-partition `row_number()/ntile() OVER (ORDER BY …)` window (and
  * its per-group skewed cousin `… OVER (PARTITION BY lang ORDER BY …)`
  * where one group holds ~90% of the corpus).
  *
  * Construction (the range-partitioned sort + broadcast-offsets plan):
  *   1. `repartitionByRange` on the total order — Spark's own global-sort
  *      machinery: partition i holds keys strictly below partition i+1,
  *      each ~n/P rows (the order MUST end in a unique tiebreaker, so
  *      range partitioning cannot pile equal keys into one partition);
  *   2. one narrow `mapPartitions` pass assigns, per physical partition,
  *      a partition-local row number AND a partition-local per-group row
  *      number (one counter + one bounded HashMap — groups are required
  *      to be bounded-cardinality dimensions: langs, sources, types);
  *   3. per-partition (and per partition×group) totals collect to the
  *      driver — P (+ P·|groups|) rows, both bounded — and prefix-sum
  *      into starting offsets, re-joined via broadcast;
  *   4. global rank = offset(pid) + local rn; group rank =
  *      offset(pid, group) + local group rn.
  *
  * The result is bit-identical to the naive window (the oracles keep the
  * naive SQL — the gate proves equality) with no `WindowExec` anywhere in
  * the plan: every stage is either a linear pass or bounded-size driver
  * work, so the plan survives a 1000-executor 100 TB run where the naive
  * window serializes the entity table through one task.
  *
  * The ranked frame is `localCheckpoint`ed (entity-grain, far below the
  * fact table) so the offsets collect and the downstream query read one
  * materialization instead of recomputing the upstream aggregate twice.
  */
object DistRank {

  /** A ranked frame plus the exact global row count (free from the
    * offsets collect — saves callers a second `count()` pass). */
  final case class Ranked(df: DataFrame, total: Long)

  private val PidCol = "__gr_pid"
  private val LrnCol = "__gr_lrn"
  private val GrnCol = "__gr_grn"

  /** 1-based global `row_number()` over `order` (which must end in a
    * unique tiebreaker) as column `rankCol`. */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Seq[Column]): Ranked =
    core(df, order, Nil, Some(rankCol), None)

  /** 1-based per-group `row_number()` (ties broken by `order`'s unique
    * tail) as `groupRankCol`, optionally plus the global rank over the
    * same total order as `globalRankCol`. `groupCols` must be
    * bounded-cardinality (dimension-like) columns. */
  def withGroupRank(df: DataFrame, groupCols: Seq[String], groupRankCol: String,
                    order: Seq[Column], globalRankCol: Option[String] = None): Ranked =
    core(df, order, groupCols, globalRankCol, Some(groupRankCol))

  /** ANSI `ntile(k) OVER (ORDER BY order)` as `outCol`: first n%k buckets
    * get n/k+1 rows, the rest n/k — computed arithmetically from the
    * exact global rank, never a window. */
  def withNtile(df: DataFrame, k: Int, outCol: String, order: Seq[Column]): DataFrame = {
    val rk = "__gr_ntile_rank"
    val Ranked(ranked, n) = withGlobalRank(df, rk, order)
    val q = n / k
    val r = n % k
    val z = col(rk) - 1 // 0-based rank
    val bucket =
      if (q == 0L) z // fewer rows than buckets: bucket i gets row i
      else when(z < lit((q + 1) * r), (z / lit(q + 1)).cast("long"))
        .otherwise(lit(r) + ((z - lit((q + 1) * r)) / lit(q)).cast("long"))
    ranked.withColumn(outCol, (bucket + 1).cast("int")).drop(rk)
  }

  /** Several independent ntile labelings against ONE payload
    * materialization. The naive chain — `withNtile(withNtile(withNtile(
    * payload, …)))` — range-shuffles and checkpoints the FULL payload
    * once per metric; this variant ranks a narrow `(key, metric)`
    * projection per metric (each pass shuffles two columns, not the
    * payload) and equi-joins the k-tile labels back on `key`. The joins
    * are entity-grain on a unique key — co-partitioned by the same join
    * key, AQE-broadcastable when the rank projections are small.
    * `df` should already be materialized (cached/checkpointed) by the
    * caller: each projection re-reads it. Ties break by (metric, key),
    * so `key` must be unique per row — same contract as the ntile window
    * `ORDER BY metric, key` this replaces bit-identically. */
  def withNtiles(df: DataFrame, k: Int, keyCol: String,
                 specs: Seq[(String, Boolean, String)]): DataFrame =
    specs.foldLeft(df) { case (acc, (metric, asc, out)) =>
      val ord = Seq(if (asc) col(metric).asc else col(metric).desc, col(keyCol))
      val labels = withNtile(df.select(col(keyCol), col(metric)), k, out, ord)
        .select(col(keyCol), col(out))
      acc.join(labels, Seq(keyCol))
    }

  private def core(df: DataFrame, order: Seq[Column], groupCols: Seq[String],
                   globalRankCol: Option[String], groupRankCol: Option[String]): Ranked = {
    val s = df.sparkSession
    val p = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(p, order: _*).sortWithinPartitions(order: _*)

    val inSchema = parted.schema
    val gIdx = groupCols.map(inSchema.fieldIndex)
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField(PidCol, IntegerType, nullable = false),
      StructField(LrnCol, LongType, nullable = false),
      StructField(GrnCol, LongType, nullable = false)))

    // one narrow pass: partition-local row number + per-group row number
    val local = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var n = 0L
      val perGroup = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        n += 1
        val gn =
          if (gIdx.isEmpty) 0L
          else {
            val k = gIdx.map(r.get)
            val v = perGroup.getOrElse(k, 0L) + 1
            perGroup(k) = v
            v
          }
        Row.fromSeq(r.toSeq ++ Seq[Any](pid, n, gn))
      }
    }(Encoders.row(outSchema)).localCheckpoint(true)

    // bounded collect: P rows (global) / ≤ P·|groups| rows (grouped).
    // max(LrnCol) per pid is the partition size because LrnCol is the
    // partition-wide running count; max(GrnCol) per (pid, group) is that
    // group's in-partition count.
    val cntRows = local
      .groupBy((PidCol +: groupCols).map(col): _*)
      .agg(max(col(LrnCol)).as("pn"), max(col(GrnCol)).as("gn"))
      .collect()

    val partTotals: Map[Int, Long] =
      cntRows.groupBy(_.getInt(0)).map { case (pid, rs) => pid -> rs.map(_.getLong(rs.head.length - 2)).max }
    val total = partTotals.values.sum
    val pidsAsc = partTotals.keys.toSeq.sorted
    val globalOff: Map[Int, Long] =
      pidsAsc.zip(pidsAsc.scanLeft(0L)((acc, pid) => acc + partTotals(pid)).dropRight(1)).toMap

    // offsets frame: (pid, group…, global offset, group offset), built on
    // the driver from the bounded collect, broadcast back
    val nG = groupCols.size
    val grouped = cntRows
      .groupBy(r => (0 until nG).map(i => r.get(i + 1)))
      .toSeq
      .flatMap { case (_, rs) =>
        val byPid = rs.sortBy(_.getInt(0))
        var acc = 0L
        byPid.map { r =>
          val off = acc
          acc += r.getLong(r.length - 1)
          (r.getInt(0), (0 until nG).map(i => r.get(i + 1)), off)
        }
      }

    val offSchema = StructType(
      StructField(PidCol, IntegerType, nullable = false) +:
        groupCols.map(g => inSchema(inSchema.fieldIndex(g))).toArray.toSeq :+
        StructField("__gr_goff", LongType, nullable = false) :+
        StructField("__gr_off", LongType, nullable = false))
    val offRows = grouped.map { case (pid, gk, goff) =>
      Row.fromSeq(pid +: gk :+ goff :+ globalOff(pid))
    }
    val offsets = s.createDataFrame(offRows.asJava, offSchema)

    // NULL-SAFE group equality: a window's PARTITION BY treats NULL as its
    // own partition, and the driver-side grouping above does too — a plain
    // equi-join would silently drop NULL-group rows here and break the
    // documented bit-identity with the window this replaces
    val off = offsets.withColumnRenamed(PidCol, PidCol + "_o")
    val gRenamed = groupCols.foldLeft(off)((d, g) => d.withColumnRenamed(g, g + "__o"))
    val cond = (col(PidCol) === col(PidCol + "_o")) +:
      groupCols.map(g => col(g) <=> col(g + "__o"))
    val joined = local.join(broadcast(gRenamed), cond.reduce(_ && _))
    val withRanks = (globalRankCol, groupRankCol) match {
      case (Some(g), Some(gr)) =>
        joined.withColumn(g, col("__gr_off") + col(LrnCol))
          .withColumn(gr, col("__gr_goff") + col(GrnCol))
      case (Some(g), None) => joined.withColumn(g, col("__gr_off") + col(LrnCol))
      case (None, Some(gr)) => joined.withColumn(gr, col("__gr_goff") + col(GrnCol))
      case (None, None) => joined
    }
    Ranked(withRanks.drop((Seq(PidCol, PidCol + "_o", LrnCol, GrnCol, "__gr_goff", "__gr_off") ++
      groupCols.map(_ + "__o")): _*), total)
  }
}

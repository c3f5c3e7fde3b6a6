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

  /** ANSI ntile bucket from a 0-based rank `z` over `n` rows: first n%k
    * buckets get n/k+1 rows, the rest n/k. ONE definition shared by the
    * single- and multi-metric paths — the formula must stay bit-identical
    * between them or the oracle gate desynchronizes. */
  private def bucketExpr(n: Long, k: Int, z: Column): Column = {
    val q = n / k
    val r = n % k
    val b =
      if (q == 0L) z // fewer rows than buckets: bucket i gets row i
      else when(z < lit((q + 1) * r), (z / lit(q + 1)).cast("long"))
        .otherwise(lit(r) + ((z - lit((q + 1) * r)) / lit(q)).cast("long"))
    (b + 1).cast("int")
  }

  /** ANSI `ntile(k) OVER (ORDER BY order)` as `outCol`: computed
    * arithmetically from the exact global rank, never a window. */
  def withNtile(df: DataFrame, k: Int, outCol: String, order: Seq[Column]): DataFrame = {
    val rk = "__gr_ntile_rank"
    val Ranked(ranked, n) = withGlobalRank(df, rk, order)
    ranked.withColumn(outCol, bucketExpr(n, k, col(rk) - 1)).drop(rk)
  }

  /** Several independent ntile labelings against ONE payload
    * materialization and ONE ranking pass. The naive chain —
    * `withNtile(withNtile(withNtile(payload, …)))` — range-shuffles,
    * checkpoints and offset-joins the payload once per metric; this
    * variant unions a narrow LONG-FORMAT projection
    * `(metric-id, sort-value, key)` (one row per metric per payload row),
    * runs a single group-ranked [[core]] pass with the metric id as the
    * bounded group — one range shuffle, one checkpoint, one offsets
    * broadcast for ALL metrics — and pivots the k-tile labels back to one
    * row per key, joined to the payload on its unique `key`.
    *
    * Contract: every metric column must be INTEGRAL (int/long) — descent
    * is encoded by BITWISE complement (`~x`, an exact order reversal for
    * every Long including Long.MinValue, where arithmetic negation
    * overflows), and a double cast could merge distinct values and
    * corrupt the tie order. NULL metric values keep Spark's window
    * placement — NULLS FIRST under asc, NULLS LAST under desc — via an
    * explicit null-rank flag, since complementing NULL would otherwise
    * float it to the wrong end. Ties break by (metric value, key), so
    * `key` must be unique per row — the same contract as the ntile
    * window `ORDER BY metric, key` this replaces bit-identically (the
    * oracles keep the naive SQL). */
  def withNtiles(df: DataFrame, k: Int, keyCol: String,
                 specs: Seq[(String, Boolean, String)]): DataFrame = {
    require(specs.nonEmpty, "withNtiles needs at least one metric spec")
    specs.foreach { case (m, _, _) =>
      val t = df.schema(m).dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType ||
        t == org.apache.spark.sql.types.ShortType,
        s"withNtiles requires integral metric columns, got $m: $t")
    }
    val long = specs.zipWithIndex.map { case ((m, asc, _), i) =>
      val v = if (asc) col(m).cast("long") else expr(s"~ CAST(`$m` AS BIGINT)")
      // Spark window null placement: asc → NULLS FIRST (flag 0 sorts
      // before non-null 1), desc → NULLS LAST (flag 1 after 0)
      val nf = if (asc) when(col(m).isNull, 0).otherwise(1)
               else when(col(m).isNull, 1).otherwise(0)
      df.select(lit(i).as("__gr_m"), nf.as("__gr_nf"),
        coalesce(v, lit(0L)).as("__gr_v"), col(keyCol))
    }.reduce(_ unionAll _)
    val Ranked(ranked, grand) = core(long,
      Seq(col("__gr_m"), col("__gr_nf"), col("__gr_v"), col(keyCol)),
      Seq("__gr_m"), None, Some("__gr_r"))
    val n = grand / specs.length // each metric ranks every payload row
    val labeled = ranked.withColumn("__gr_b", bucketExpr(n, k, col("__gr_r") - 1))
    val wide = labeled.groupBy(col(keyCol))
      .agg(
        max(when(col("__gr_m") === 0, col("__gr_b"))).as(specs.head._3),
        specs.zipWithIndex.tail.map { case ((_, _, out), i) =>
          max(when(col("__gr_m") === i, col("__gr_b"))).as(out)
        }: _*)
    df.join(wide, Seq(keyCol))
  }

  /** Per-partition census, reported by the ranking pass itself through an
    * accumulator: partition row count plus each group's in-partition
    * count. Deduped BY PID on the driver, which makes the accumulator
    * path retry/speculation-safe: a re-run task reports the identical
    * deterministic value for its pid, and duplicates collapse (the
    * default countFailedValues=false already excludes failed tasks). */
  private final case class PartCounts(pid: Int, n: Long, groups: Map[Seq[Any], Long])

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

    // one narrow pass: partition-local row number + per-group row number.
    // The same pass REPORTS the per-partition census through the
    // accumulator when its input is exhausted — the checkpoint job that
    // materializes the ranked rows therefore also delivers the counts,
    // where the previous construction paid a separate aggregate+collect
    // job per rank pass (visible overhead on multi-pass callers like
    // q134/q183).
    val acc = s.sparkContext.collectionAccumulator[PartCounts]("distrank_counts")
    val local = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var n = 0L
      val perGroup = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      val mapped = it.map { r =>
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
      new Iterator[Row] {
        private var reported = false
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h && !reported) {
            reported = true
            acc.add(PartCounts(pid, n,
              if (gIdx.isEmpty) Map(Seq.empty[Any] -> 0L) else perGroup.toMap))
          }
          h
        }
        def next(): Row = mapped.next()
      }
    }(Encoders.row(outSchema)).localCheckpoint(true)

    // the census is bounded: P entries (global) / ≤ P·|groups| group
    // cells, both driver-safe by the bounded-cardinality group contract
    val counts: Seq[PartCounts] = acc.value.asScala.toSeq
      .groupBy(_.pid).map(_._2.head).toSeq

    val partTotals: Map[Int, Long] = counts.map(c => c.pid -> c.n).toMap
    val total = partTotals.values.sum
    val pidsAsc = partTotals.keys.toSeq.sorted
    val globalOff: Map[Int, Long] =
      pidsAsc.zip(pidsAsc.scanLeft(0L)((acc, pid) => acc + partTotals(pid)).dropRight(1)).toMap

    // offsets frame: (pid, group…, global offset, group offset), built on
    // the driver from the census, broadcast back
    val grouped = counts.flatMap(_.groups.keys).distinct.flatMap { gk =>
      val byPid = counts.filter(_.groups.contains(gk)).sortBy(_.pid)
      var accum = 0L
      byPid.map { c =>
        val off = accum
        accum += c.groups(gk)
        (c.pid, gk, off)
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

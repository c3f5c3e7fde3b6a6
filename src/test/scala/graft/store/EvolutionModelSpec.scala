package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField}

/** Model-based test for schema evolution under op interleaving — the
  * [[SnapshotModelSpec]] pattern pointed at the evolution axis: a
  * deterministic random sequence of appends (sometimes carrying evolved
  * columns, sometimes not), ADD / RENAME / WIDEN / DROP evolutions,
  * compactions, predicate erasures and snapshots runs against the real
  * store AND a trivial in-memory model (rows as id→value maps keyed by a
  * STABLE column id, so the model is oblivious to renames by
  * construction); after every op the live read — and any snapshot read,
  * under whatever schema is CURRENT at read time — must equal the model
  * exactly. This is the oracle for states the hand-written spec can't
  * enumerate: compacting a month whose files straddle three schema
  * generations, erasing through a rename on a pre-rename file, widening
  * a column some files carry as int32, a snapshot pinned two renames
  * ago. */
class EvolutionModelSpec extends SparkSpec {

  // model row: Severity (unique id), ID, evolved values by stable col id
  private case class MRow(sev: Int, id: String, extra: Map[Int, Option[Long]])
  // evolved column: stable id, CURRENT name, widened-to-long yet?
  private case class MCol(id: Int, name: String, wide: Boolean)

  private def month(sev: Int): String = Seq("2019-04", "2019-05", "2019-06")(sev % 3)

  test("random evolve/rename/widen/drop/append/compact/erase/snapshot sequences match the model") {
    import spark.implicits._
    // coverage flags span all seeds: each seed's op draw is deterministic,
    // but no single seed is guaranteed to draw every op kind in 30 steps
    var didRename = false; var didWiden = false; var didDrop = false
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val path = tmpDir(s"evo-model-$seed")
      var nextSev = 0
      var nextName = 0
      var cols = Vector.empty[MCol]
      var model = Vector.empty[MRow]
      // snapshot id -> (rows at pin, col ids at pin) — cols added after
      // the pin read as NULL; cols dropped since are simply not selected
      var snaps = Map.empty[String, Vector[MRow]]
      // CDC-cursor model: sev watermark at pin + whether maintenance has
      // rewritten files since (a rewrite invalidates the append-only
      // cursor and readAppendedSince must refuse LOUDLY, not over-report)
      var snapSevAtPin = Map.empty[String, Int]
      var snapDirty = Map.empty[String, Boolean]
      def markDirty(): Unit = snapDirty = snapDirty.map { case (k, _) => k -> true }

      def mkDf(rows: Seq[MRow], withCols: Seq[MCol]) = {
        val base = rows.map { r =>
          (r.sev, s"m${r.sev % 2}", "default",
            Timestamp.valueOf(f"${month(r.sev)}-${1 + (r.sev % 27)}%02d 12:00:00"),
            "Role", Option(s"id${r.sev}"))
        }.toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
        withCols.foldLeft(base) { (d, c) =>
          val byKey: Map[Int, Option[Long]] =
            rows.map(r => r.sev -> r.extra.getOrElse(c.id, None)).toMap
          val f = udf((sev: Int) =>
            byKey(sev).map(java.lang.Long.valueOf).orNull: java.lang.Long)
          d.withColumn(c.name, f(col("Severity")).cast(if (c.wide) "bigint" else "int"))
        }
      }

      def numAt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
        if (r.isNullAt(i)) None else r.get(i) match {
          case l: java.lang.Long => Some(l)
          case n: java.lang.Integer => Some(n.toLong)
          case other => fail(s"unexpected value $other")
        }

      def collectRows(df: org.apache.spark.sql.DataFrame): Set[(Int, String, Seq[Option[Long]])] =
        df.select((Seq("Severity", "ID") ++ cols.map(_.name)).map(col): _*).collect()
          .map(r => (r.getInt(0), r.getString(1),
            cols.indices.map(i => numAt(r, 2 + i)))).toSet

      def modelRows(rows: Vector[MRow]): Set[(Int, String, Seq[Option[Long]])] =
        rows.map(r => (r.sev, s"id${r.sev}",
          cols.map(c => r.extra.getOrElse(c.id, None)))).toSet

      // first op must be an append (evolve/compact need an existing store)
      var step = 0
      while (step < 30) {
        val op = if (step == 0) 0 else rnd.nextInt(9)
        op match {
          case 0 | 1 => // append, carrying a random prefix of the evolved cols
            val carry = cols.take(if (cols.isEmpty) 0 else rnd.nextInt(cols.size + 1))
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              val sev = nextSev; nextSev += 1
              MRow(sev, s"id$sev",
                carry.map(c => c.id -> (if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong)
                                        else None)).toMap)
            }
            TraceStore.append(mkDf(rows, carry), path)
            model ++= rows
          case 2 if model.nonEmpty => // ADD a fresh nullable int column
            val c = MCol(nextName, s"X$nextName", wide = false); nextName += 1
            TraceStore.evolveSchema(path, StructField(c.name, IntegerType, nullable = true))
            cols :+= c
          case 3 if model.nonEmpty => // compact everything (threshold 0)
            if (TraceStore.compact(spark, path,
                maxFilesPerMonth = 0, splitsPerMonth = 2).nonEmpty) markDirty()
          case 4 if model.nonEmpty => // erase: on a base col, or an evolved col
            if (cols.nonEmpty && rnd.nextBoolean()) {
              val c = cols(rnd.nextInt(cols.size))
              val v = rnd.nextInt(100).toLong
              if (TraceStore.deleteWhere(spark, path, col(c.name) === v).nonEmpty)
                markDirty()
              model = model.filterNot(_.extra.getOrElse(c.id, None).contains(v))
            } else {
              val sev = rnd.nextInt(math.max(nextSev, 1))
              if (TraceStore.deleteWhere(spark, path, col("Severity") === sev).nonEmpty)
                markDirty()
              model = model.filterNot(_.sev == sev)
            }
          case 5 if model.nonEmpty => // snapshot now; maybe read an old one
            val id = TraceStore.snapshot(path)
            snaps += id -> model
            snapSevAtPin += id -> nextSev
            snapDirty += id -> false
            if (snaps.size > 1 && rnd.nextBoolean()) {
              val (sid, srows) = snaps.toSeq(rnd.nextInt(snaps.size))
              // a snapshot reads under the CURRENT schema: renames
              // resolve, later-added cols are NULL, dropped cols gone
              val got = collectRows(TraceStore.readSnapshot(spark, path, sid))
              assert(got == modelRows(srows), s"seed=$seed step=$step snapshot $sid")
              // CDC cursor against the same pin: on a clean (no-rewrite)
              // cursor the increment is exactly the rows appended since —
              // read under the CURRENT schema, through any rename/widen;
              // after a rewrite the cursor must refuse loudly
              if (snapDirty(sid)) {
                val e = intercept[Exception] {
                  TraceStore.readAppendedSince(spark, path, sid).collect()
                }
                assert(e.getMessage.contains("re-base"),
                  s"seed=$seed step=$step dirty cursor $sid: ${e.getMessage}")
              } else {
                val gotInc = collectRows(TraceStore.readAppendedSince(spark, path, sid))
                val wantInc = modelRows(model.filter(_.sev >= snapSevAtPin(sid)))
                assert(gotInc == wantInc, s"seed=$seed step=$step cdc $sid")
              }
            }
          case 6 if cols.nonEmpty => // RENAME a random evolved column
            val i = rnd.nextInt(cols.size)
            val to = s"R$nextName"; nextName += 1
            TraceStore.renameColumn(path, cols(i).name, to)
            cols = cols.updated(i, cols(i).copy(name = to))
            didRename = true
          case 7 if cols.exists(!_.wide) => // WIDEN a random int column to long
            val narrow = cols.zipWithIndex.filter(!_._1.wide)
            val (c, i) = narrow(rnd.nextInt(narrow.size))
            TraceStore.widenColumn(path, c.name, LongType)
            cols = cols.updated(i, c.copy(wide = true))
            didWiden = true
          case 8 if cols.size > 1 => // DROP a random evolved column
            val i = rnd.nextInt(cols.size)
            TraceStore.dropColumn(path, cols(i).name)
            cols = cols.patch(i, Nil, 1)
            // model rows keep the id's values; they are simply never
            // selected again (and can never resurrect: name retired)
            didDrop = true
          case _ => // op not applicable yet; skip without consuming a step
            step -= 1
        }
        step += 1
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
          assert(collectRows(TraceStore.read(spark, path)) == modelRows(model),
            s"seed=$seed step=$step op=$op")
      }
      assert(model.nonEmpty && nextName > 0, s"seed=$seed exercised too little")
    }
    assert(didRename && didWiden && didDrop,
      "the seed set did not exercise rename/widen/drop — lengthen the run")
  }
}

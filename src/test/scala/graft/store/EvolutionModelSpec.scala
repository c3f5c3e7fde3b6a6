package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Model-based test for schema evolution under op interleaving — the
  * [[SnapshotModelSpec]] pattern pointed at the evolution axis: a
  * deterministic random sequence of appends (sometimes carrying evolved
  * columns, sometimes not), evolutions, compactions, predicate erasures
  * and snapshots runs against the real store AND a trivial in-memory
  * model (rows as column→value maps, null-widened on every evolution);
  * after every op the live read — and any snapshot read, under whatever
  * schema is CURRENT at read time — must equal the model exactly. This
  * is the oracle for states the hand-written spec can't enumerate, e.g.
  * compacting a month whose files straddle two schema generations, or
  * erasing on an evolved column where pre-evolution rows read NULL. */
class EvolutionModelSpec extends SparkSpec {

  // model row: Severity (unique id), ID, and evolved col values (None = null)
  private case class MRow(sev: Int, id: String, extra: Map[String, Option[Long]])

  private def month(sev: Int): String = Seq("2019-04", "2019-05", "2019-06")(sev % 3)

  test("random evolve/append/compact/erase/snapshot sequences match the model") {
    import spark.implicits._
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val path = tmpDir(s"evo-model-$seed")
      var nextSev = 0
      var nextCol = 0
      var evolved = Vector.empty[String] // evolved column names, in order
      var model = Vector.empty[MRow]
      var snaps = Map.empty[String, Vector[MRow]]

      def mkDf(rows: Seq[MRow], withCols: Seq[String]) = {
        val base = rows.map { r =>
          (r.sev, s"m${r.sev % 2}", "default",
            Timestamp.valueOf(f"${month(r.sev)}-${1 + (r.sev % 27)}%02d 12:00:00"),
            "Role", Option(s"id${r.sev}"))
        }.toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
        withCols.foldLeft(base) { (d, c) =>
          val byKey: Map[Int, Option[Long]] =
            rows.map(r => r.sev -> r.extra.getOrElse(c, None)).toMap
          val f = udf((sev: Int) =>
            byKey(sev).map(java.lang.Long.valueOf).orNull: java.lang.Long)
          d.withColumn(c, f(col("Severity")))
        }
      }

      def liveRows(): Set[(Int, String, Seq[Option[Long]])] =
        TraceStore.read(spark, path)
          .select((Seq("Severity", "ID") ++ evolved).map(col): _*).collect()
          .map { r =>
            (r.getInt(0), r.getString(1),
              evolved.indices.map(i => if (r.isNullAt(2 + i)) None else Some(r.getLong(2 + i))))
          }.toSet

      def modelRows(rows: Vector[MRow]): Set[(Int, String, Seq[Option[Long]])] =
        rows.map(r => (r.sev, s"id${r.sev}",
          evolved.map(c => r.extra.getOrElse(c, None)))).toSet

      // first op must be an append (evolve/compact need an existing store)
      var step = 0
      while (step < 22) {
        val op = if (step == 0) 0 else rnd.nextInt(6)
        op match {
          case 0 | 1 => // append, carrying a random prefix of the evolved cols
            val carry = evolved.take(if (evolved.isEmpty) 0 else rnd.nextInt(evolved.size + 1))
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              val sev = nextSev; nextSev += 1
              MRow(sev, s"id$sev",
                carry.map(c => c -> (if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong)
                                     else None)).toMap)
            }
            TraceStore.append(mkDf(rows, carry), path)
            model ++= rows
          case 2 if model.nonEmpty => // evolve a fresh nullable long column
            val c = s"X$nextCol"; nextCol += 1
            TraceStore.evolveSchema(path, StructField(c, LongType, nullable = true))
            evolved :+= c
          case 3 if model.nonEmpty => // compact everything (threshold 0)
            TraceStore.compact(spark, path, maxFilesPerMonth = 0, splitsPerMonth = 2)
          case 4 if model.nonEmpty => // erase: on a base col, or an evolved col
            if (evolved.nonEmpty && rnd.nextBoolean()) {
              val c = evolved(rnd.nextInt(evolved.size))
              val v = rnd.nextInt(100).toLong
              TraceStore.deleteWhere(spark, path, col(c) === v)
              model = model.filterNot(_.extra.getOrElse(c, None).contains(v))
            } else {
              val sev = rnd.nextInt(math.max(nextSev, 1))
              TraceStore.deleteWhere(spark, path, col("Severity") === sev)
              model = model.filterNot(_.sev == sev)
            }
          case 5 if model.nonEmpty => // snapshot now; maybe read an old one
            val id = TraceStore.snapshot(path)
            snaps += id -> model
            if (snaps.size > 1 && rnd.nextBoolean()) {
              val (sid, srows) = snaps.toSeq(rnd.nextInt(snaps.size))
              val got = TraceStore.readSnapshot(spark, path, sid)
                .select((Seq("Severity", "ID") ++ evolved).map(col): _*).collect()
                .map { r =>
                  (r.getInt(0), r.getString(1),
                    evolved.indices.map(i =>
                      if (r.isNullAt(2 + i)) None else Some(r.getLong(2 + i))))
                }.toSet
              // a snapshot reads under the CURRENT schema: columns evolved
              // after the pin read as NULL unless the pinned files carry them
              val want = srows.map(r => (r.sev, s"id${r.sev}",
                evolved.map(c => r.extra.getOrElse(c, None)))).toSet
              assert(got == want, s"seed=$seed step=$step snapshot $sid")
            }
          case _ => // op not applicable yet; skip without consuming a step
            step -= 1
        }
        step += 1
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
          assert(liveRows() == modelRows(model), s"seed=$seed step=$step op=$op")
      }
      assert(model.nonEmpty && evolved.nonEmpty, s"seed=$seed exercised too little")
    }
  }
}

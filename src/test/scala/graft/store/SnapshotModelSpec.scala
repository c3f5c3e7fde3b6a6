package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based test for the snapshot layer: a deterministic random
  * sequence of store operations runs against both the real store and a
  * trivial in-memory model (live row set + per-snapshot frozen row
  * sets); after EVERY op, the live read and every live snapshot read
  * must equal the model exactly. This is the oracle for op-interleaving
  * states the hand-written specs can't enumerate (e.g. thin after drop
  * after two snapshots pinning different generations of the same
  * month). Sequential single-writer — concurrency is the soak's job. */
class SnapshotModelSpec extends SparkSpec {

  private type Row = (Int, String)  // (Severity = id, ID)

  private def mkBatch(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      val month = Seq("2019-04", "2019-05", "2019-06")(i % 3)
      (i, s"m${i % 2}", "default",
        Timestamp.valueOf(f"$month-${1 + (i % 27)}%02d 12:00:00"),
        "Role", Option(s"id$i"))
    }.toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
  }

  private def liveRows(path: String): Set[Row] =
    TraceStore.read(spark, path).select("Severity", "ID").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet

  private def snapRows(path: String, id: String): Set[Row] =
    TraceStore.readSnapshot(spark, path, id).select("Severity", "ID").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet

  /** (inserts, deletes) of the rewrite-surviving change feed. */
  private def feedRows(path: String, id: String): (Set[Row], Set[Row]) = {
    val rows = TraceStore.readChangesSince(spark, path, id)
      .select("_change", "Severity", "ID").collect()
    (rows.filter(_.getString(0) == "insert")
       .map(r => (r.getInt(1), r.getString(2))).toSet,
     rows.filter(_.getString(0) == "delete")
       .map(r => (r.getInt(1), r.getString(2))).toSet)
  }

  /** The store's deterministic 1-in-k thinning predicate, replayed on the
    * model (content-hash over all columns; only months older than the
    * newest keepExact months thin). Computed by asking Spark for the
    * hash of each candidate row — the model must not re-implement
    * xxhash64. */
  private def thinnedSurvivors(rows: Set[Row], k: Int): Set[Row] = {
    import spark.implicits._
    if (rows.isEmpty) return rows
    val df = mkBatch(rows.map(_._1).toSeq)
    val keep = df.filter(pmod(xxhash64(
        graft.schema.TraceSchema.target.fieldNames.map(col).toIndexedSeq: _*),
        lit(k.toLong)) === 0L)
      .select("Severity", "ID").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    keep
  }

  private def month(id: Int): String = Seq("201904", "201905", "201906")(id % 3)

  test("random op sequences: live + every snapshot match the model after each op") {
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val path = tmpDir(s"snap-model-$seed")
      var nextId = 0
      var live = Set.empty[Row]
      var snaps = Map.empty[String, Set[Row]]

      def append(): Unit = {
        val ids = (0 until 1 + rnd.nextInt(3)).map(_ => { nextId += 1; nextId })
        TraceStore.append(mkBatch(ids), path)
        live ++= ids.map(i => (i, s"id$i"))
      }
      append() // non-empty start

      (1 to 24).foreach { step =>
        rnd.nextInt(8) match {
          case 0 | 1 => append()
          case 2 =>
            TraceStore.compact(spark, path, maxFilesPerMonth = 1, splitsPerMonth = 1)
          case 3 =>
            val victim = 1 + rnd.nextInt(nextId)
            TraceStore.deleteWhere(spark, path, col("ID") === s"id$victim")
            live -= ((victim, s"id$victim"))
          case 4 =>
            val sid = TraceStore.snapshot(path)
            snaps += sid -> live
          case 5 if snaps.nonEmpty =>
            val sid = snaps.keys.toSeq.sorted.head
            TraceStore.dropSnapshot(path, sid)
            TraceStore.vacuumSnapshots(path)
            snaps -= sid
          case 6 =>
            // thin months older than the newest month present (k=2)
            val newest = if (live.isEmpty) "000000" else live.map(r => month(r._1)).max
            val expired = live.filter(r => month(r._1) < newest)
            TraceStore.thinExpired(spark, path, keepExactMonths = 1, k = 2)
            live = (live -- expired) ++ thinnedSurvivors(expired, 2)
          case _ =>
            // retention: drop everything before the newest month
            val newest = if (live.isEmpty) "999999" else live.map(r => month(r._1)).max
            TraceStore.dropPartitionsBefore(path, newest)
            live = live.filter(r => month(r._1) >= newest)
        }
        assert(liveRows(path) == live, s"seed=$seed step=$step: live diverged")
        snaps.foreach { case (sid, want) =>
          assert(snapRows(path, sid) == want,
            s"seed=$seed step=$step: snapshot $sid diverged")
          // the change feed must equal the model diff after EVERY op —
          // compactions and erase-rewrites included (the states
          // readAppendedSince refuses are exactly the interesting ones)
          val (ins, del) = feedRows(path, sid)
          assert(ins == live -- want,
            s"seed=$seed step=$step: feed inserts since $sid diverged")
          assert(del == want -- live,
            s"seed=$seed step=$step: feed deletes since $sid diverged")
        }
        // snapshot-PAIR diff (oldest vs newest live pin): readChangesBetween
        // must equal the model diff of the two frozen states, whatever
        // maintenance ran between or after them
        if (snaps.size >= 2) {
          val ids = snaps.keys.toSeq.sorted
          val (a, b) = (ids.head, ids.last)
          val rows = TraceStore.readChangesBetween(spark, path, a, b)
            .select("_change", "Severity", "ID").collect()
          val ins2 = rows.filter(_.getString(0) == "insert")
            .map(r => (r.getInt(1), r.getString(2))).toSet
          val del2 = rows.filter(_.getString(0) == "delete")
            .map(r => (r.getInt(1), r.getString(2))).toSet
          assert(ins2 == snaps(b) -- snaps(a),
            s"seed=$seed step=$step: between-inserts $a->$b diverged")
          assert(del2 == snaps(a) -- snaps(b),
            s"seed=$seed step=$step: between-deletes $a->$b diverged")
        }
      }
      // teardown sanity: dropping every snapshot lets vacuum clear _retired
      snaps.keys.foreach(TraceStore.dropSnapshot(path, _))
      TraceStore.vacuumSnapshots(path)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path).resolve("_retired")), s"seed=$seed")
      assert(liveRows(path) == live, s"seed=$seed: vacuum disturbed live rows")
    }
  }
}

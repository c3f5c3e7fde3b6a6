package graft.store

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-travel contract: a snapshot id pins the exact row set at capture
  * time across every maintenance mutation (compact, DELETE WHERE,
  * retention drop), survives crash recovery, and releases its storage
  * through drop + vacuum. */
class SnapshotSpec extends SparkSpec {

  private def row(sev: Int, t: String, id: Option[String]) =
    (sev, s"m$sev", "default", Timestamp.valueOf(t), "Role", id)

  private def mkStore(path: String, n: Int): Unit = {
    import spark.implicits._
    // n single-row appends → n files per touched month (compactable)
    (0 until n).foreach { i =>
      TraceStore.append(Seq(
        row(i, f"2019-05-${(i % 27) + 1}%02d 12:00:00", Some(s"id$i"))
      ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    }
  }

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.select(col("Severity"), col("ID")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet

  test("snapshot survives compaction bit-for-bit; live read sees the compacted table") {
    val path = tmpDir("snap-compact")
    mkStore(path, 6)
    val before = rows(TraceStore.read(spark, path))
    val id = TraceStore.snapshot(path)
    val compacted = TraceStore.compact(spark, path, maxFilesPerMonth = 2, splitsPerMonth = 1)
    assert(compacted == Seq("201905"))
    assert(rows(TraceStore.read(spark, path)) == before)           // live rows unchanged
    assert(rows(TraceStore.readSnapshot(spark, path, id)) == before) // snapshot identical
    // pinned pre-compaction files moved to _retired, not deleted
    assert(Files.exists(Paths.get(path).resolve("_retired").resolve("ym=201905")))
    // ym partition column survives the snapshot read path
    val yms = TraceStore.readSnapshot(spark, path, id)
      .select("ym").distinct().collect().map(_.getString(0)).toSeq
    assert(yms == Seq("201905"))
  }

  test("snapshot is point-in-time across DELETE WHERE") {
    val path = tmpDir("snap-delete")
    mkStore(path, 4)
    val before = rows(TraceStore.read(spark, path))
    val id = TraceStore.snapshot(path)
    TraceStore.deleteWhere(spark, path, col("ID") === "id1")
    val live = rows(TraceStore.read(spark, path))
    assert(live == before.filterNot(_._2 == "id1"))
    assert(rows(TraceStore.readSnapshot(spark, path, id)) == before)
  }

  test("retention drop retires pinned files; snapshot still reads the dropped month") {
    import spark.implicits._
    val path = tmpDir("snap-drop")
    TraceStore.append(Seq(
      row(1, "2019-04-10 08:00:00", Some("old")),
      row(2, "2019-06-10 08:00:00", Some("new"))
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    val before = rows(TraceStore.read(spark, path))
    val id = TraceStore.snapshot(path)
    assert(TraceStore.dropPartitionsBefore(path, "201906") == Seq("201904"))
    assert(rows(TraceStore.read(spark, path)) == Set((2, "new")))
    assert(rows(TraceStore.readSnapshot(spark, path, id)) == before)
  }

  test("unpinned maintenance still deletes outright (no retired garbage)") {
    val path = tmpDir("snap-none")
    mkStore(path, 6)
    TraceStore.compact(spark, path, maxFilesPerMonth = 2, splitsPerMonth = 1)
    assert(!Files.exists(Paths.get(path).resolve("_retired")))
  }

  test("drop + vacuum reclaims exactly the unpinned retired files") {
    val path = tmpDir("snap-vacuum")
    mkStore(path, 6)
    val s1 = TraceStore.snapshot(path)
    TraceStore.compact(spark, path, maxFilesPerMonth = 2, splitsPerMonth = 1)
    val s2 = TraceStore.snapshot(path)                 // pins only live files
    assert(TraceStore.vacuumSnapshots(path).isEmpty)   // s1 still pins retired set
    val s1rows = rows(TraceStore.readSnapshot(spark, path, s1))
    TraceStore.dropSnapshot(path, s1)
    val removed = TraceStore.vacuumSnapshots(path)
    assert(removed.nonEmpty)
    assert(!Files.exists(Paths.get(path).resolve("_retired")),
      "vacuum must clear emptied month dirs")
    // s2 (live-file snapshot) still reads fine
    assert(rows(TraceStore.readSnapshot(spark, path, s2)) == s1rows)
    // s1 is gone; a read must fail loudly, not return partial data
    intercept[IllegalArgumentException] {
      TraceStore.readSnapshot(spark, path, s1)
    }
  }

  test("crash between install and delete: recovery retires pinned files") {
    val path = tmpDir("snap-crash")
    mkStore(path, 4)
    val before = rows(TraceStore.read(spark, path))
    val id = TraceStore.snapshot(path)
    val monthDir = Paths.get(path).resolve("ym=201905")
    val old = FsMaint.listDir(monthDir).filter(_.toString.endsWith(".parquet"))
    // fabricate the committed-but-undeleted crash state the soak spec
    // uses: rewrite done + installed, manifest present, old files still
    // in place (the transient-duplicate window)
    val tmp = monthDir.resolveSibling(".compact-201905-snapcr")
    spark.read.schema(graft.schema.TraceSchema.target)
      .parquet(old.map(_.toString): _*)
      .repartition(1).sortWithinPartitions(col("Time"))
      .write.mode("overwrite").parquet(tmp.toString)
    val installs = FsMaint.listDir(tmp).filter(_.toString.endsWith(".parquet"))
      .zipWithIndex.map { case (f, i) => (f.getFileName.toString, f"compacted-201905-snapcr-$i%05d.parquet") }
    Files.write(monthDir.resolve("_compact_manifest"),
      (".compact-201905-snapcr" +:
       (installs.map { case (a, b) => s"install\t$a\t$b" } ++
        old.map(p => s"delete\t${p.getFileName}"))).mkString("\n").getBytes)
    installs.foreach { case (from, to) =>
      Files.move(tmp.resolve(from), monthDir.resolve(to))
    }
    // the change feed must resolve the crashed attempt BEFORE diffing:
    // without recovery the installed copies are live-but-unpinned and
    // the whole month would over-report as inserts
    assert(TraceStore.readChangesSince(spark, path, id).count() == 0,
      "a half-committed rewrite must not surface in the feed")
    // next maintenance call runs recovery: the delete-set must RETIRE
    // (snapshot pins it), and the snapshot must still read exactly
    TraceStore.compact(spark, path, maxFilesPerMonth = 9999)
    assert(!Files.exists(monthDir.resolve("_compact_manifest")))
    assert(rows(TraceStore.read(spark, path)) == before)
    assert(rows(TraceStore.readSnapshot(spark, path, id)) == before)
    assert(Files.exists(Paths.get(path).resolve("_retired").resolve("ym=201905")))
  }

  test("readAppendedSince yields exactly the increment; refuses after a rewrite") {
    import spark.implicits._
    val path = tmpDir("snap-incr")
    mkStore(path, 3)
    val s1 = TraceStore.snapshot(path)
    // nothing appended yet → empty increment with the store schema
    val empty = TraceStore.readAppendedSince(spark, path, s1)
    assert(empty.count() == 0 && empty.columns.contains("ym"))
    TraceStore.append(Seq(
      row(100, "2019-06-02 09:00:00", Some("late"))
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    assert(rows(TraceStore.readAppendedSince(spark, path, s1)) == Set((100, "late")))
    // cycle: re-base, append again, increment is only the second batch
    val s2 = TraceStore.snapshot(path)
    TraceStore.append(Seq(
      row(101, "2019-06-03 09:00:00", Some("later"))
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    assert(rows(TraceStore.readAppendedSince(spark, path, s2)) == Set((101, "later")))
    // a maintenance rewrite invalidates the append-only premise: refuse
    TraceStore.compact(spark, path, maxFilesPerMonth = 1, splitsPerMonth = 1)
    intercept[IllegalArgumentException] {
      TraceStore.readAppendedSince(spark, path, s2)
    }
  }

  test("readChangesSince survives rewrites: compaction no-op, erase → deletes") {
    import spark.implicits._
    val path = tmpDir("snap-feed")
    mkStore(path, 4) // ids 0..3, May 2019
    val s1 = TraceStore.snapshot(path)
    def feed(): Map[String, Set[(Int, String)]] =
      TraceStore.readChangesSince(spark, path, s1)
        .select(col("_change"), col("Severity"), col("ID")).collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(r => (r.getInt(1), r.getString(2))).toSet }
    assert(feed() == Map.empty) // no changes yet
    // pure compaction must be INVISIBLE — the exact state
    // readAppendedSince refuses (its own spec above proves the refusal)
    TraceStore.compact(spark, path, maxFilesPerMonth = 1, splitsPerMonth = 1)
    assert(feed() == Map.empty, "a pure rewrite must not surface in the feed")
    // append B, then erase one baseline row and one B row
    TraceStore.append(Seq(
      row(100, "2019-06-02 09:00:00", Some("b0")),
      row(101, "2019-06-02 10:00:00", Some("b1"))
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    TraceStore.deleteWhere(spark, path, col("ID") === "id1" || col("ID") === "b1")
    // compact again across the erase boundary
    TraceStore.compact(spark, path, maxFilesPerMonth = 1, splitsPerMonth = 1)
    assert(feed() == Map(
      "insert" -> Set((100, "b0")),          // b1 inserted+erased in-window: never surfaces
      "delete" -> Set((1, "id1"))))          // baseline row erased → delete
    // retention drop of the baseline month → remaining baseline rows delete
    TraceStore.dropPartitionsBefore(path, "201906")
    assert(feed() == Map(
      "insert" -> Set((100, "b0")),
      "delete" -> Set((0, "id0"), (1, "id1"), (2, "id2"), (3, "id3"))))
    // releasing the snapshot destroys the baseline: refuse loudly (a
    // pinned-but-manually-deleted retired file fails the same way via
    // the vacuumed-file check; vacuum itself can never remove a pin of
    // a LIVE manifest, so that arm is only reachable by interference)
    TraceStore.dropSnapshot(path, s1)
    TraceStore.vacuumSnapshots(path)
    intercept[IllegalArgumentException] { TraceStore.readChangesSince(spark, path, s1) }
  }

  test("advanceCursor drives an at-least-once CDC consumer loop across maintenance") {
    import spark.implicits._
    val path = tmpDir("snap-cursor")
    mkStore(path, 3) // ids 0..2
    val s0 = TraceStore.snapshot(path)
    TraceStore.append(Seq(
      row(100, "2019-06-02 09:00:00", Some("b0"))
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    TraceStore.deleteWhere(spark, path, col("ID") === "id1")
    TraceStore.compact(spark, path, maxFilesPerMonth = 1, splitsPerMonth = 1)
    def asSets(df: DataFrame) = {
      val rs = df.select(col("_change"), col("Severity"), col("ID")).collect()
      (rs.filter(_.getString(0) == "insert").map(r => (r.getInt(1), r.getString(2))).toSet,
       rs.filter(_.getString(0) == "delete").map(r => (r.getInt(1), r.getString(2))).toSet)
    }
    val (feed1, s1) = TraceStore.advanceCursor(spark, path, s0)
    assert(asSets(feed1) == (Set((100, "b0")), Set((1, "id1"))))
    // crash before commit → re-run from the SAME prev pin: identical feed
    // (both pins still exist; the extra pin is dropped with the old one)
    val (feed1b, s1b) = TraceStore.advanceCursor(spark, path, s0)
    assert(asSets(feed1b) == asSets(feed1))
    // durable commit → release everything before the new cursor
    TraceStore.dropSnapshot(path, s0); TraceStore.dropSnapshot(path, s1)
    TraceStore.vacuumSnapshots(path)
    // next cycle sees only the new increment
    TraceStore.append(Seq(
      row(101, "2019-06-03 09:00:00", Some("b1"))
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    val (feed2, s2) = TraceStore.advanceCursor(spark, path, s1b)
    assert(asSets(feed2) == (Set((101, "b1")), Set.empty[(Int, String)]))
    assert(TraceStore.listSnapshots(path) == Seq(s1b, s2))
  }

  test("snapshot ids are monotonic and listable") {
    val path = tmpDir("snap-ids")
    mkStore(path, 2)
    val a = TraceStore.snapshot(path)
    val b = TraceStore.snapshot(path)
    assert(a == "s000001" && b == "s000002")
    assert(TraceStore.listSnapshots(path) == Seq(a, b))
  }
}

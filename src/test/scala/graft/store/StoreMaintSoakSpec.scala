package graft.store

import java.sql.Timestamp
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concurrency + crash-point soak for the store maintenance protocol
  * ([[TraceStore.compact]] / [[TraceStore.deleteWhere]] /
  * [[TraceStore.thinExpired]]): the unit tests in StoreSpec exercise each
  * operation alone; this spec drives the documented operating envelope —
  * ONE maintenance writer interleaving compact, deleteWhere and
  * downsampling retention, concurrent APPENDS, and a concurrent reader —
  * and the two crash points the manifest protocol promises to survive
  * (mid-install, and post-install/pre-delete).
  *
  * Visibility contract under concurrency (from the compact scaladoc):
  *  - no row is ever LOST: a reader snapshot contains every previously
  *    committed, non-erased row at least once;
  *  - between install and delete a row may transiently appear TWICE,
  *    never more (swaps are serialized by the single-writer rule);
  *  - a reader that races a file delete fails loudly (FileNotFound) —
  *    never a silent partial month.
  */
class StoreMaintSoakSpec extends SparkSpec {

  /** One row per id; even ids land in 201905, odd in 201906. The id rides
    * in Severity (the only int column) so snapshots can account for every
    * row. `doomed` ids get Machine="doomed" — the deleteWhere target. */
  private def mkBatch(ids: Seq[Int], doomed: Set[Int]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val month = if (i % 2 == 0) "2019-05" else "2019-06"
      val day = 1 + (i % 27)
      (i, if (doomed(i)) "doomed" else s"m${i % 3}", "default",
        Timestamp.valueOf(f"$month-$day%02d 12:00:00"), "Role", Option(s"id$i"))
    }.toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
  }

  private def idsIn(path: String): Seq[Int] =
    TraceStore.read(spark, path).select("Severity").collect().map(_.getInt(0)).toSeq

  test("soak: compact+deleteWhere+thinExpired interleaved with appends and a live reader") {
    val path = tmpDir("soak")
    val doomed = (0 until 48).filter(_ % 12 == 7).toSet  // erased at some point mid-soak
    val baseIds = 0 until 48
    val lateIds = 48 until 72                            // appended DURING maintenance
    // seed as many micro-batches (8 files/month) so compact has real work
    baseIds.grouped(6).foreach(g => TraceStore.append(mkBatch(g, doomed), path))
    // an EXPIRED month (201904 < the newest-2 window): thinned mid-soak to
    // its deterministic content-hash survivor set, monotonically
    val oldIds = 1000 until 1048
    oldIds.grouped(6).foreach { g =>
      import spark.implicits._
      TraceStore.append(g.map(i => (i, s"m${i % 3}", "default",
        Timestamp.valueOf(f"2019-04-${1 + (i % 27)}%02d 12:00:00"), "Role",
        Option(s"id$i")))
        .toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID"), path)
    }
    val thinSurvivors = {
      import graft.schema.TraceSchema
      spark.read.schema(TraceSchema.target).parquet(s"$path/ym=201904")
        .filter(pmod(xxhash64(TraceSchema.target.fieldNames.map(col).toIndexedSeq: _*),
          lit(3L)) === 0L)
        .select("Severity").collect().map(_.getInt(0)).toSet
    }
    assert(thinSurvivors.nonEmpty && thinSurvivors.size < oldIds.size,
      "fixture must actually thin")

    val firstError = new AtomicReference[Throwable]()
    def guarded(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case e: Throwable => firstError.compareAndSet(null, e) })
      t.start(); t
    }

    val maintDone = new AtomicBoolean(false)
    val okSnapshots = new AtomicInteger(0)
    val racedReads = new AtomicInteger(0)
    val violations = new CopyOnWriteArrayList[String]()

    // single maintenance writer: compact, deleteWhere and thinExpired
    // interleaved (all three share the manifest swap protocol); a
    // time-travel snapshot is taken mid-rotation (snapshot() runs
    // recovery, so it belongs to the single-writer rotation too) and
    // must stay bit-stable through the remaining rounds of rewrites
    val snapId = new AtomicReference[String]()
    val snapIds = new AtomicReference[Seq[Int]]()
    val maint = guarded {
      (1 to 4).foreach { r =>
        TraceStore.compact(spark, path, maxFilesPerMonth = 2, splitsPerMonth = 2)
        TraceStore.deleteWhere(spark, path, col("Machine") === "doomed", splitsPerMonth = 2)
        if (r >= 2) // first round leaves 201904 fat so compact touches it too
          TraceStore.thinExpired(spark, path, keepExactMonths = 2, k = 3, splitsPerMonth = 2)
        if (r == 2) {
          val sid = TraceStore.snapshot(path)
          snapId.set(sid)
          snapIds.set(TraceStore.readSnapshot(spark, path, sid)
            .select("Severity").collect().map(_.getInt(0)).toSeq)
        }
      }
      maintDone.set(true)
    }
    // concurrent appender: new committed batches must survive every swap
    // (capture-first file sets make them invisible to in-flight rewrites)
    val appender = guarded {
      lateIds.grouped(6).foreach { g =>
        TraceStore.append(mkBatch(g, Set.empty), path)
        Thread.sleep(30)
      }
    }
    // concurrent reader: every successful snapshot must satisfy the
    // visibility contract; a raced file delete may fail the read loudly
    val reader = guarded {
      val allowed = baseIds.toSet ++ lateIds ++ oldIds
      while (!maintDone.get()) {
        try {
          val seen = idsIn(path)
          val counts = seen.groupBy(identity).view.mapValues(_.size)
          // thin survivors must NEVER vanish; non-survivors may (that's
          // the point), but only rows thinning/erasure condemns may go
          val missing = ((baseIds.toSet -- doomed) ++ thinSurvivors) -- seen.toSet
          if (missing.nonEmpty)
            violations.add(s"lost rows in snapshot: $missing")
          val alien = seen.toSet -- allowed
          if (alien.nonEmpty)
            violations.add(s"fabricated ids: $alien")
          val tooMany = counts.filter(_._2 > 2).toMap
          if (tooMany.nonEmpty)
            violations.add(s"seen >2 times (unserialized swap?): $tooMany")
          okSnapshots.incrementAndGet()
        } catch { case _: Exception => racedReads.incrementAndGet() }
        Thread.sleep(20)
      }
    }
    Seq(maint, appender, reader).foreach(_.join(600000))
    assert(firstError.get() == null, s"worker thread died: ${firstError.get()}")
    assert(violations.isEmpty, violations.toString)
    assert(okSnapshots.get() >= 1,
      s"reader never observed a clean snapshot (raced=${racedReads.get()})")

    // quiesced final state: exact multiset — every non-doomed row exactly
    // once, every doomed row gone (the last deleteWhere ran after the
    // final compact of its files; appended-late rows were never doomed)
    TraceStore.deleteWhere(spark, path, col("Machine") === "doomed")
    val fin = idsIn(path)
    val want = (baseIds.toSet -- doomed) ++ lateIds ++ thinSurvivors
    assert(fin.distinct.size == fin.size, "duplicates survived quiescence")
    assert(fin.toSet == want,
      s"final id set off: missing=${want -- fin.toSet} extra=${fin.toSet -- want}")

    // the mid-soak snapshot: taken post-recovery by the single writer, so
    // it must be duplicate-free and complete for every row no mutation
    // had condemned by its capture round (doomed erased in round 1, first
    // thinning done) — and BIT-STABLE through the later rounds' rewrites
    val capture = snapIds.get()
    assert(capture != null, "snapshot round never ran")
    assert(capture.distinct.size == capture.size, "mid-soak snapshot has dupes")
    val mustHave = (baseIds.toSet -- doomed) ++ thinSurvivors
    assert((mustHave -- capture.toSet).isEmpty,
      s"snapshot lost rows: ${mustHave -- capture.toSet}")
    assert((capture.toSet -- (baseIds.toSet ++ lateIds ++ oldIds)).isEmpty,
      "snapshot fabricated ids")
    val replay = TraceStore.readSnapshot(spark, path, snapId.get())
      .select("Severity").collect().map(_.getInt(0)).toSeq
    assert(replay.sorted == capture.sorted,
      "snapshot not stable across subsequent maintenance")
    // release + vacuum: retired storage reclaimed, live rows untouched
    TraceStore.dropSnapshot(path, snapId.get())
    TraceStore.vacuumSnapshots(path)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path).resolve("_retired")))
    assert(idsIn(path).toSet == want, "vacuum disturbed live rows")
  }

  /** Fabricate a crashed rewrite for month `ym`: temp output written,
    * manifest committed, and `preInstalled` of the installs already moved
    * into place (the crash landed mid-install loop). Old files are left
    * in place. Returns (installedNames, oldNames). */
  private def fabricateCrash(path: String, ym: String,
                             preInstalled: Int): (Seq[String], Seq[String]) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val monthDir = Paths.get(path, s"ym=$ym")
    val old = Files.list(monthDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    val tmpName = s".compact-$ym-crashpt"
    val tmp = monthDir.resolveSibling(tmpName)
    spark.read.schema(graft.schema.TraceSchema.target)
      .parquet(old.map(_.toString): _*)
      .repartitionByRange(2, col("Time")).sortWithinPartitions(col("Time"))
      .write.option("compression", "zstd").parquet(tmp.toString)
    val installs = Files.list(tmp).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.getFileName.toString)
      .zipWithIndex
      .map { case (f, i) => (f.getFileName.toString, f"compacted-$ym-crashpt-$i%05d.parquet") }
    Files.write(monthDir.resolve("_compact_manifest"),
      (tmpName +:
        (installs.map { case (a, b) => s"install\t$a\t$b" } ++
          old.map(p => s"delete\t${p.getFileName}"))).mkString("\n").getBytes)
    // the crash point: some installs already moved, the rest still in tmp
    installs.take(preInstalled).foreach { case (from, to) =>
      Files.move(tmp.resolve(from), monthDir.resolve(to), StandardCopyOption.ATOMIC_MOVE)
    }
    (installs.map(_._2), old.map(_.getFileName.toString))
  }

  test("crash mid-install (half the installs moved) is completed by recovery") {
    import java.nio.file.{Files, Paths}
    val path = tmpDir("crash-mid")
    (0 until 24).grouped(6).foreach(g => TraceStore.append(mkBatch(g, Set.empty), path))
    val before = idsIn(path).sorted
    val (installed, olds) = fabricateCrash(path, "201905", preInstalled = 1)
    assert(installed.size >= 2, "crash fixture needs ≥2 install files to land mid-loop")

    // recovery runs at the head of the next maintenance call
    TraceStore.compact(spark, path, maxFilesPerMonth = 1000)

    val monthDir = Paths.get(path, "ym=201905")
    import scala.jdk.CollectionConverters._
    val files = Files.list(monthDir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(installed.forall(files.contains), s"installs incomplete: $files")
    assert(olds.forall(o => !files.contains(o)), s"old files survived: $files")
    assert(!Files.exists(monthDir.resolve("_compact_manifest")))
    assert(idsIn(path).sorted == before)          // no loss, no dupes
  }

  test("crash after installs, before deletes (the dupe window) is cleaned by recovery") {
    import java.nio.file.{Files, Paths}
    val path = tmpDir("crash-dupe")
    (0 until 24).grouped(6).foreach(g => TraceStore.append(mkBatch(g, Set.empty), path))
    val before = idsIn(path).sorted
    val (installed, olds) =
      fabricateCrash(path, "201906", preInstalled = Int.MaxValue)
    // the documented transient window: a reader NOW sees duplicates
    val during = idsIn(path)
    assert(during.size > before.size, "fixture should expose the dupe window")

    TraceStore.deleteWhere(spark, path, col("Machine") === "nonexistent")

    val monthDir = Paths.get(path, "ym=201906")
    import scala.jdk.CollectionConverters._
    val files = Files.list(monthDir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(installed.forall(files.contains))
    assert(olds.forall(o => !files.contains(o)), s"old files survived: $files")
    assert(idsIn(path).sorted == before)          // dupes resolved, no loss
  }
}

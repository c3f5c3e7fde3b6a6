package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.SparkSpec

/** Regression matrix for the three `events.ts` parquet encodings the
  * driver's generator has shipped across rounds:
  *
  *   - TIMESTAMP(NANOS)            (round ≤2; Spark has no native type)
  *   - TIMESTAMP(µs, NTZ)          (round 3 — silently broke 16 queries
  *                                  at ANALYSIS because Spark 4 infers
  *                                  TIMESTAMP_NTZ and `unix_micros` is
  *                                  LTZ-only; none of the per-query specs
  *                                  caught it because fixtures were all
  *                                  Spark-written LTZ)
  *   - TIMESTAMP(µs, LTZ/adjusted) (what Spark itself writes)
  *
  * For each encoding this spec builds an sf-dir (other tables symlinked
  * from sf0.001, events swapped for the encoding under test) and runs the
  * ANALYSIS pass — `.queryExecution.optimizedPlan` — of every registered
  * query over it, so an encoding-dependent analysis failure surfaces in
  * `sbt test` before the driver ever sees it. Execution correctness per
  * encoding is covered by the single-encoding oracle gate; analysis is
  * where round 3 broke. (Not strictly analysis-ONLY: a handful of query
  * constructors eagerly materialize shared intermediates per dir — Toks'
  * checkpoint, the bucketed/partitioned layout builds — which at sf0.001
  * costs a few seconds per encoding and usefully exercises those write
  * paths against each events encoding too.)
  */
class TsEncodingMatrixSpec extends SparkSpec {

  private val baseSf = "/root/testdata/sf0.001"
  private val otherTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** sf-dir with every table but events symlinked from sf0.001. */
  private def dirWithEvents(tag: String)(writeEvents: String => Unit): String = {
    val d = tmpDir(s"tsmatrix_$tag")
    otherTables.foreach { t =>
      Files.createSymbolicLink(Paths.get(d, s"$t.parquet"),
        Paths.get(baseSf, s"$t.parquet"))
    }
    writeEvents(s"$d/events.parquet")
    d
  }

  // Canonical LTZ events (normalized through Tables.events, whatever the
  // current testdata encoding is) — source frame for the derived fixtures.
  private lazy val canonical = Tables.events(spark, baseSf)

  private lazy val ltzDir = dirWithEvents("ltz") { p =>
    canonical.write.parquet(p) // Spark writes TIMESTAMP(µs, adjusted=UTC)
  }
  private lazy val ntzDir = dirWithEvents("ntz") { p =>
    canonical.withColumn("ts", canonical("ts").cast(TimestampNTZType))
      .write.parquet(p) // isAdjustedToUTC=false, the round-3 encoding
  }
  private lazy val nanosDir = dirWithEvents("nanos") { p =>
    // Spark cannot write TIMESTAMP(NANOS): pre-generated pyarrow fixture
    // (same 1000 sf0.001 rows, ts cast to ns)
    val fixture = getClass.getResource("/graft/events_nanos.parquet")
    assert(fixture != null, "events_nanos.parquet test resource missing")
    Files.createDirectory(Paths.get(p))
    Files.copy(Paths.get(fixture.toURI), Paths.get(p, "part-0.parquet"))
  }

  private def analyzeAll(dir: String, tag: String): Unit = {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.optimizedPlan; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(200)}")
        }
    }
    assert(failures.isEmpty,
      s"[$tag] ${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("events.ts normalizes to TIMESTAMP under every encoding") {
    for ((d, tag) <- Seq((ltzDir, "ltz"), (ntzDir, "ntz"), (nanosDir, "nanos")))
      assert(Tables.events(spark, d).schema("ts").dataType == TimestampType,
        s"encoding $tag did not normalize to TimestampType")
  }

  test("a cached NTZ relation still normalizes (defensive cast branch)") {
    // Simulate a relation cached BEFORE Tables.events set
    // inferTimestampNTZ=false — e.g. another component reading the same
    // path first with default confs: the cast branch must still fix it.
    val d = dirWithEvents("ntzpre") { p =>
      canonical.withColumn("ts", canonical("ts").cast(TimestampNTZType))
        .write.parquet(p)
    }
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val pre = Tables(spark, d, "events") // populates the relation cache
      assert(pre.schema("ts").dataType == TimestampNTZType)
      assert(Tables.events(spark, d).schema("ts").dataType == TimestampType)
    } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  test("all queries pass analysis on LTZ-encoded events") {
    analyzeAll(ltzDir, "ltz")
  }

  test("all queries pass analysis on NTZ-encoded events") {
    analyzeAll(ntzDir, "ntz")
  }

  test("all queries pass analysis on NANOS-encoded events") {
    analyzeAll(nanosDir, "nanos")
  }

  test("the round-3-breaking time ops EXECUTE identically on every encoding") {
    // analysis was where round 3 broke, but runtime is a distinct code
    // path (the parquet reader re-resolves confs at execution): run the
    // native as-of join and the time-RANGE frame — the two ops that
    // failed — to a result on each encoding and compare values across
    // encodings (same logical rows whatever the physical type)
    def run(dir: String): (Seq[String], Seq[String]) = {
      val asof = graft.SparkEntry.queries("q51_asof_native")(spark, dir)
        .orderBy("event_id").limit(50).collect().map(_.toString).toSeq
      val frame = graft.SparkEntry.queries("q68_rolling_window")(spark, dir)
        .orderBy("user_id", "ts").limit(50).collect().map(_.toString).toSeq
      (asof, frame)
    }
    val (aL, fL) = run(ltzDir)
    val (aN, fN) = run(ntzDir)
    val (aG, fG) = run(nanosDir)
    assert(aL.nonEmpty && fL.nonEmpty)
    assert(aL == aN && aL == aG, "as-of results differ across ts encodings")
    assert(fL == fN && fL == fG, "window-frame results differ across ts encodings")
  }

  // float64/JSON-string embedding encodings: see EmbEncodingMatrixSpec,
  // the vector-column analogue of this matrix.
}

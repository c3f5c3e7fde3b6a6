package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.SparkSpec

/** Defensive encoding matrix for `embeddings.embedding`, the vector-kernel
  * analogue of [[TsEncodingMatrixSpec]]: the driver's generator owns the
  * parquet layout and has already drifted once (the events.ts NTZ break),
  * so the three plausible vector encodings are pinned here before any of
  * them can silently break 30 queries:
  *
  *   - array<float>   (current testdata; the kernels' native type)
  *   - array<double>  (pyarrow's default if the generator ever drops the
  *                     float32 cast)
  *   - JSON string    ("[0.1,0.2,…]" — the NDJSON-ingest shape; a plain
  *                     cast cannot parse it, so Tables.embeddings needs
  *                     the from_json branch)
  *
  * For each, `Tables.embeddings` must normalize to array<float> and every
  * registered query must pass ANALYSIS; the vector kernels must EXECUTE
  * to identical results (today's values are float32-exact, so both the
  * f64 widening and the JSON decimal round-trip are lossless —
  * `Float.toString`/parse round-trips exactly).
  */
class EmbEncodingMatrixSpec extends SparkSpec {

  private val baseSf = "/root/testdata/sf0.001"
  private val otherTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "events")

  private def dirWithEmbeddings(tag: String)(write: String => Unit): String = {
    val d = tmpDir(s"embmatrix_$tag")
    otherTables.foreach { t =>
      Files.createSymbolicLink(Paths.get(d, s"$t.parquet"),
        Paths.get(baseSf, s"$t.parquet"))
    }
    write(s"$d/embeddings.parquet")
    d
  }

  private lazy val canonical = Tables.embeddings(spark, baseSf)

  private lazy val f32Dir = dirWithEmbeddings("f32") { p =>
    canonical.write.parquet(p)
  }
  private lazy val f64Dir = dirWithEmbeddings("f64") { p =>
    canonical.withColumn("embedding",
      col("embedding").cast(ArrayType(DoubleType))).write.parquet(p)
  }
  private lazy val jsonDir = dirWithEmbeddings("json") { p =>
    canonical.withColumn("embedding", to_json(col("embedding")))
      .write.parquet(p)
  }

  private val allDirs = Seq(("f32", () => f32Dir), ("f64", () => f64Dir),
    ("json", () => jsonDir))

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

  test("embeddings.embedding normalizes to array<float> under every encoding") {
    for ((tag, d) <- allDirs)
      assert(Tables.embeddings(spark, d()).schema("embedding").dataType ==
        ArrayType(FloatType, containsNull = true),
        s"encoding $tag did not normalize to array<float>")
  }

  test("all queries pass analysis on float64-encoded embeddings") {
    analyzeAll(f64Dir, "emb-f64")
  }

  test("all queries pass analysis on JSON-string-encoded embeddings") {
    analyzeAll(jsonDir, "emb-json")
  }

  test("testdata embeddings are float32-exact (generator drift canary)") {
    // THE loud-failure defense for true-f64 generator drift (ADVICE r5 #5):
    // Tables.embeddings narrows double→float by contract, and the DuckDB
    // oracles compute on whatever the parquet holds — values that are not
    // f32-exact would make round(…,4) gate columns flake at rounding
    // boundaries with no diagnosable signal. This canary turns that
    // silent hash flake into a named assertion: if a future testdata
    // round ships array<double> with values that do not survive the
    // f64→f32→f64 round-trip, it fails HERE with the remediation.
    import org.apache.spark.sql.Row
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1") if Files.exists(Paths.get(s"/root/testdata/$sf"))) {
      val raw = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      raw.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => // stored f32: narrowing is identity
        case ArrayType(DoubleType, _) =>
          val bad = raw.select(col("embedding")).limit(100000).collect().iterator
            .flatMap { case Row(xs: scala.collection.Seq[_]) =>
              xs.collect { case d: Double if d.toFloat.toDouble != d => d } }
            .take(3).toSeq
          assert(bad.isEmpty,
            s"$sf embeddings are TRUE float64 (e.g. ${bad.mkString(", ")}): the " +
            "f32-narrowing contract in Tables.embeddings no longer matches the " +
            "full-precision oracle input — quantize the oracle legs through " +
            "float32 (unnest(embedding)::FLOAT::DOUBLE) or widen the kernels")
        case other => fail(s"$sf embeddings element type drifted to $other")
      }
    }
  }

  test("f32 narrowing at a round-4dp boundary is the pinned contract") {
    // Construct a TRUE-f64 value straddling a round(…,4) half-up boundary:
    // v rounds UP in f64 but its nearest float32 sits BELOW the boundary.
    // The pinned semantic: a double-encoded table is interpreted as
    // quantized-through-f32 (norm = round4(f32(v))), which also proves a
    // full-precision oracle WOULD disagree — exactly the mismatch the
    // drift canary above exists to catch before the gate flakes.
    def round4(d: Double): BigDecimal =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val v = (1000 to 40000).iterator
      .map(k => k * 1e-4 + 5e-5 + 1e-12)
      .find(x => round4(x) != round4(x.toFloat.toDouble))
      .getOrElse(fail("no boundary-straddling double found"))
    val d = dirWithEmbeddings("boundary") { p =>
      import spark.implicits._
      Seq((0L, Seq(v), 0)).toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
        .write.parquet(p)
    }
    val got = graft.SparkEntry.queries("q29_embed_norm")(spark, d)
      .select(col("nrm")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(round4(v.toFloat.toDouble).toDouble),
      s"f64 input must be quantized through f32 before round4 (v=$v)")
    assert(round4(v.toFloat.toDouble) != round4(v),
      "fixture lost its boundary property — pick a new straddling value")
  }

  test("vector kernels execute identically on every embedding encoding") {
    // one query per kernel family: the fused cosine Expression (exact
    // kNN), the LSH bucketing path, and the norm/quantize map ops —
    // values must be bit-identical because the source is float32-exact
    def run(dir: String): Map[String, Seq[String]] =
      Seq("q29_embed_norm", "q30_knn_exact", "q31_ann_lsh").map { q =>
        val df = graft.SparkEntry.queries(q)(spark, dir)
        q -> df.orderBy(df.columns.map(col).toIndexedSeq: _*)
          .limit(40).collect().map(_.toString).toSeq
      }.toMap
    val base = run(f32Dir)
    base.foreach { case (q, rows) => assert(rows.nonEmpty, s"$q empty") }
    assert(run(f64Dir) == base, "f64 encoding changed vector results")
    assert(run(jsonDir) == base, "JSON encoding changed vector results")
  }
}

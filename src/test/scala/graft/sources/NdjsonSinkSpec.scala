package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** DSv2 JSONEachRow sink: atomic per-task publish, _SUCCESS batch marker,
  * and round-trip through the engine's own NDJSON scan (A5 ↔ A10/A11). */
class NdjsonSinkSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def listNames(dir: String): Seq[String] = {
    val st = Files.list(Paths.get(dir))
    try st.iterator().asScala.map(_.getFileName.toString).toVector
    finally st.close()
  }

  test("ndjson sink writes one file per partition and round-trips") {
    import spark.implicits._
    val dir = tmpDir("ndjson-sink")
    val df = Seq(
      (1L, "alpha beta", 1.5, ts("2024-01-01 10:00:00")),
      (2L, "quote\"back\\slash", 2.5, ts("2024-01-02 11:30:00")),
      (3L, "unicode ✓ line", -0.25, ts("2024-02-01 00:00:00"))
    ).toDF("id", "s", "v", "t")

    df.repartition(2).write.format("graft-ndjson").mode("append").save(dir)

    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    val names = listNames(dir)
    val parts = names.filter(_.endsWith(".ndjson"))
    assert(parts.size == 2, s"expected 2 part files, got $parts")
    assert(parts.forall(_.startsWith("part-")))
    // every part file's batch marker exists; no temp residue
    val markers = names.filter(_.startsWith("_SUCCESS-")).map(_.stripPrefix("_SUCCESS-"))
    assert(parts.forall(p => markers.exists(p.contains)), s"unmarked parts: $parts")
    assert(!names.exists(_.endsWith(".tmp")))

    val back = spark.read.schema(df.schema).json(dir)
    assert(back.count() == 3)
    val orig = df.collect().map(_.toSeq).toSet
    val got = back.collect().map(_.toSeq).toSet
    assert(got == orig, s"round-trip mismatch: $got vs $orig")
  }

  test("ndjson sink append accumulates batches under one _SUCCESS") {
    import spark.implicits._
    val dir = tmpDir("ndjson-append")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.coalesce(1).write.format("graft-ndjson").mode("append").save(dir)
    df.coalesce(1).write.format("graft-ndjson").mode("append").save(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.count() == 4)
  }
}

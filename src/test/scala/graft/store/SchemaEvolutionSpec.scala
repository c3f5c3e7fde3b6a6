package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField}

/** Schema evolution contract: adding a nullable column is metadata-only
  * (old files null-fill in the same scan), validation is loud, and every
  * downstream surface — maintenance rewrites, predicate erasure,
  * snapshots — resolves the EVOLVED schema, not the base one. */
class SchemaEvolutionSpec extends SparkSpec {

  private def baseBatch() = {
    import spark.implicits._
    Seq(
      (10, "m1", "default", Timestamp.valueOf("2019-05-13 15:37:32"), "Role", Option("a")),
      (20, "m2", "default", Timestamp.valueOf("2019-06-01 00:00:00"), "Metrics", None),
      (30, "m1", "default", Timestamp.valueOf("2019-05-20 10:00:00"), "Role", Option("b")),
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
  }

  private def evolvedBatch() = {
    import spark.implicits._
    Seq(
      (40, "m3", "default", Timestamp.valueOf("2019-05-25 12:00:00"), "Role", Option("c"), Option("eu")),
      (50, "m3", "default", Timestamp.valueOf("2019-07-02 08:00:00"), "Net", None, None: Option[String]),
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID", "Region")
  }

  test("evolve adds a nullable column; old files read as NULL, new files carry values") {
    val path = tmpDir("evo1")
    TraceStore.append(baseBatch(), path)
    val v = TraceStore.evolveSchema(path, StructField("Region", StringType, nullable = true))
    assert(v == 2)
    TraceStore.append(evolvedBatch(), path)
    val got = TraceStore.read(spark, path)
    assert(got.columns.contains("Region"))
    assert(got.count() == 5)
    assert(got.filter(col("Region").isNull).count() == 4) // 3 old + 1 new null
    assert(got.filter(col("Region") === "eu").select("Severity").head().getInt(0) == 40)
    // a second evolution versions on top
    assert(TraceStore.evolveSchema(path, StructField("Score", IntegerType, nullable = true)) == 3)
    assert(TraceStore.read(spark, path).columns.takeRight(2).toSeq == Seq("Score", "ym"))
  }

  test("evolution validation is loud; appends validate against the stored schema") {
    val path = tmpDir("evo2")
    TraceStore.append(baseBatch(), path)
    // unknown column before evolution → rejected, not silently dropped
    intercept[IllegalArgumentException] { TraceStore.append(evolvedBatch(), path) }
    // non-nullable evolution is impossible (history has no values)
    intercept[IllegalArgumentException] {
      TraceStore.evolveSchema(path, StructField("Region", StringType, nullable = false))
    }
    // duplicate / partition-column names rejected
    intercept[IllegalArgumentException] {
      TraceStore.evolveSchema(path, StructField("Severity", StringType, nullable = true))
    }
    intercept[IllegalArgumentException] {
      TraceStore.evolveSchema(path, StructField("ym", StringType, nullable = true))
    }
    // missing base column rejected
    intercept[IllegalArgumentException] {
      TraceStore.append(baseBatch().drop("Machine"), path)
    }
  }

  test("maintenance rewrites carry evolved columns; deleteWhere can target them") {
    val path = tmpDir("evo3")
    TraceStore.append(baseBatch(), path)
    TraceStore.evolveSchema(path, StructField("Region", StringType, nullable = true))
    TraceStore.append(evolvedBatch(), path)
    // force-compact every month: the rewrite must preserve Region values
    val compacted = TraceStore.compact(spark, path, maxFilesPerMonth = 0)
    assert(compacted.nonEmpty)
    val after = TraceStore.read(spark, path)
    assert(after.count() == 5)
    assert(after.filter(col("Region") === "eu").count() == 1)
    // predicate erasure on the EVOLVED column (old-file rows read it as
    // NULL, so cond is UNKNOWN there and must not erase them)
    val erased = TraceStore.deleteWhere(spark, path, col("Region") === "eu")
    assert(erased == Seq("201905"))
    val end = TraceStore.read(spark, path)
    assert(end.count() == 4)
    assert(end.filter(col("Region").isNotNull).count() == 0)
  }

  test("snapshots taken before an evolution read back under the evolved schema") {
    val path = tmpDir("evo4")
    TraceStore.append(baseBatch(), path)
    val snap = TraceStore.snapshot(path)
    TraceStore.evolveSchema(path, StructField("Region", StringType, nullable = true))
    TraceStore.append(evolvedBatch(), path)
    val old = TraceStore.readSnapshot(spark, path, snap)
    assert(old.count() == 3 && old.filter(col("Region").isNotNull).count() == 0)
    val delta = TraceStore.readAppendedSince(spark, path, snap)
    assert(delta.count() == 2 && delta.filter(col("Region") === "eu").count() == 1)
  }
}

package graft.schema

import java.sql.Timestamp
import graft.SparkSpec
import graft.store.TraceStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution: the reference's documented extension workflow is
  * "edit the `columns` whitelist" (/root/reference/README.md:135-137,
  * 186-189). Because the whitelist is data (TraceSchema.columns) and reads
  * declare their schema explicitly, extending it must keep OLD stored
  * files readable: parquet fills absent columns with nulls. */
class EvolutionSpec extends SparkSpec {

  test("files written under the old whitelist read cleanly under an extended one") {
    import spark.implicits._
    val path = tmpDir("evo")
    // v1 store: today's 6-column whitelist
    val batch = Seq(
      (10, "m1", "g", Timestamp.valueOf("2019-05-13 15:37:32"), "Role", Option("a")),
      (20, "m2", "g", Timestamp.valueOf("2019-05-14 00:00:00"), "Metrics", None),
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID")
    TraceStore.append(batch, path)

    // v2 whitelist: the reference's raw frame carries Locality
    // (README.md:81-88) — promote it into the declared schema
    val evolved = StructType(
      TraceSchema.target.fields :+ StructField("Locality", StringType, nullable = true) :+
      StructField(TraceSchema.PartitionCol, StringType))
    val got = spark.read.schema(evolved).parquet(path)
    assert(got.count() == 2)
    // old rows surface the new column as null, everything else intact
    assert(got.filter(col("Locality").isNull).count() == 2)
    assert(got.select("Severity").collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20))

    // and a v2 batch with the new column coexists in the same table path
    val batch2 = Seq(
      (30, "m3", "g", Timestamp.valueOf("2019-05-15 00:00:00"), "Role", Option("c"), Option("dc1")),
    ).toDF("Severity", "Machine", "LogGroup", "Time", "Type", "ID", "Locality")
      .withColumn("ym", date_format(col("Time"), "yyyyMM"))
    batch2.write.mode("append").partitionBy("ym").parquet(path)
    val all = spark.read.schema(evolved).parquet(path)
    assert(all.count() == 3)
    assert(all.filter(col("Locality") === "dc1").count() == 1)
  }
}

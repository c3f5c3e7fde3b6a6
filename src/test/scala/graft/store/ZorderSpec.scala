package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order clustering contract: per-file min/max ranges become narrow on
  * BOTH interleaved dimensions, so point/range predicates on either one
  * skip most files — versus a single-dimension sort where the trailing
  * dimension's per-file range spans the whole domain (no skipping). */
class ZorderSpec extends SparkSpec {

  /** Fraction of files a point predicate on `c` must read, averaged over
    * the domain: mean over files of (per-file value range / domain). */
  private def meanCoverage(path: String, c: String, domain: Long): Double = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c)) + 1L).cast("double").as("w"))
      .agg(avg(col("w"))).collect()(0).getDouble(0)
    stats / domain
  }

  private def mkEvents(): DataFrame = {
    import spark.implicits._
    // 64k rows, user 0..255, ts 0..65535 — independent dimensions
    spark.range(65536).select(
      (col("id") * 2654435761L % 256).as("user"),
      (col("id") * 40503L % 65536).as("ts"))
  }

  test("morton interleave: bits land at even/odd positions") {
    import spark.implicits._
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Zorder.interleave(col("a"), col("b"), 3)).collect()(0).getLong(0)
    // a=101 → bits 0,2 at positions 0,4 = 17; b=011 → bits 0,1 at 1,3 = 10
    assert(got == 27L)
  }

  test("cell clamps and buckets linearly") {
    import spark.implicits._
    val got = Seq(-5L, 0L, 511L, 512L, 1023L, 5000L).toDF("v")
      .select(Zorder.cell(col("v"), 0L, 1023L, 4).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L, 2L, 3L, 3L))
  }

  test("z-ordered layout skips on both dimensions; time-sort only on time") {
    val df = mkEvents()
    val zPath = tmpDir("zorder")
    val tPath = tmpDir("timesort")

    Zorder.cluster(df,
      Zorder.cell(col("user"), 0L, 255L, 8),
      Zorder.cell(col("ts"), 0L, 65535L, 8), nFiles = 16)
      .write.mode("overwrite").parquet(zPath)

    df.repartitionByRange(16, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(tPath)

    // time-sorted: perfect on ts, useless on user (every file spans it)
    assert(meanCoverage(tPath, "ts", 65536L) < 0.15)
    assert(meanCoverage(tPath, "user", 256L) > 0.9)

    // z-ordered: BOTH dimensions narrow — a point predicate on either
    // reads a fraction of the files (16 files over an 8×8 grid → each
    // file covers ~1/4 of each dimension)
    assert(meanCoverage(zPath, "user", 256L) < 0.5)
    assert(meanCoverage(zPath, "ts", 65536L) < 0.5)
  }
}

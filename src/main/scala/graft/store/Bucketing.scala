package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support for co-located fact-fact joins (builder prompt:
  * "repartition/bucketing for co-located joins").
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides. Writing both tables bucketed (and sorted) by the join key means
  * Spark's scan already satisfies the join's required distribution —
  * the SortMergeJoin runs with NO Exchange on either side (verified by
  * plan assertion in BucketingSpec). This is the Spark analogue of the
  * reference's MergeTree ORDER BY locality (trace-converter.py:24) applied
  * to join keys instead of scan keys.
  */
object Bucketing {

  /** Write df as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count on the join key. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

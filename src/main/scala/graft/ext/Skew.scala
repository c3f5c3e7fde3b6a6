package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins (builder prompt: "salting for
  * skew"; complements AQE's runtime skew-join splitting with a static
  * technique that also works for aggregations).
  *
  * A hot key (one machine emitting most trace events, one user owning most
  * events) funnels its entire partition through one task. Salting spreads
  * the hot key across `saltFactor` tasks: the probe side gets a
  * deterministic salt derived from a discriminator column; the build side
  * is replicated once per salt value. Join semantics are unchanged
  * (verified value-equal to the plain join in SkewSpec).
  */
object Skew {

  /** Left (large, possibly skewed) ⋈ right (smaller, unique join keys).
    * `disc` is any left-side column whose values spread within the hot key
    * (e.g. the event id). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, disc: String): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(disc)), lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-tolerant aggregation: partial aggregate on
    * (key, salt) — spreading a hot key over saltFactor reducers — then
    * final aggregate on key. Equivalent to a plain groupBy-sum. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltFactor: Int, disc: String): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(disc)), lit(saltFactor.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__n")).as("n"))
}

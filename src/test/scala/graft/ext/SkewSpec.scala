package graft.ext

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Salted join/aggregation must be value-equivalent to the plain forms. */
class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin equals plain join") {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", 4, "o_orderkey")
      .select("o_orderkey", "c_name").orderBy("o_orderkey")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("saltedSumCount equals plain aggregation") {
    val ev = Tables.events(spark, dir)
    val plain = ev.groupBy("user_id")
      .agg(round(sum("value"), 2).as("sum_value"), count(lit(1)).as("n"))
      .orderBy("user_id").collect().toSeq
    val salted = Skew.saltedSumCount(ev, "user_id", "value", 4, "event_id")
      .select(col("user_id"), round(col("sum_value"), 2).as("sum_value"), col("n"))
      .orderBy("user_id").collect().toSeq
    assert(salted == plain)
  }
}

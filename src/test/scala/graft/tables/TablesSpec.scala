package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The relation cache must hand back the same analyzed relation per
  * (session, path) — and never cross paths. */
class TablesSpec extends SparkSpec {

  test("relation cache reuses the DataFrame per path and keeps paths distinct") {
    import spark.implicits._
    val d1 = tmpDir("tcache1"); val d2 = tmpDir("tcache2")
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$d1/documents.parquet")
    Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text").write.parquet(s"$d2/documents.parquet")
    val a1 = Tables.documents(spark, d1)
    val a2 = Tables.documents(spark, d1)
    val b = Tables.documents(spark, d2)
    assert(a1 eq a2)                       // cached instance reused
    assert(!(a1 eq b))
    assert(a1.count() == 1 && b.count() == 2)
    assert(b.orderBy(col("doc_id")).collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }
}

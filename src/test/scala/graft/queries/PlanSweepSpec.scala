package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Engine-wide plan guard: NO registered query may plan a
  * CartesianProduct. Every intended cross join in the suite broadcasts a
  * bounded side (query vectors, scalar bounds), which plans as
  * BroadcastNestedLoopJoin — an unhinted cross join appearing anywhere
  * would be an accidental O(n²) that small-SF correctness runs would
  * never surface. This sweep builds every physical plan at sf0.001
  * (queries with eager materialization execute their small prefix) and
  * fails on the operator name. */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}

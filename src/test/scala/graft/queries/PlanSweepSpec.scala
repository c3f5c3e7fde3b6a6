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

  /** Queries ALLOWED to run a `WindowExec` with an empty partition spec,
    * because the window's input is provably BOUNDED (resolution- or
    * calendar-sized, independent of corpus row count) — a global sort
    * over such a table is driver-scale work, not a data funnel. Every
    * entry states its bound; anything not listed that plans an
    * unpartitioned window fails the sweep, so the q158/q134/q150/q65
    * fix (round 5) cannot silently regress back to global ntile/rank. */
  private val boundedGlobalWindow: Map[String, String] = Map(
    "q84_retention"         -> "day-offset table after the offset groupBy (≤ days in range)",
    "q95_dataset_card"      -> "source × lang grid (dimension-bounded)",
    "q96_recursive_spine"   -> "recursive month spine (calendar-bounded)",
    "q112_vocab_growth"     -> "corpus/102400 block-offset table (two-level q97 sweep)",
    "q129_chi_square"       -> "event_type × day-of-week contingency grid (|types|·7)",
    "q130_ks_test"          -> "distinct-value histogram of cents-resolution `value`",
    "q157_interpolate"      -> "per-calendar-hour series table (≤ hours in range)",
    "q159_benford"          -> "9-row leading-digit table",
    "q163_skyline"          -> "per-delay-day threshold table (delay-resolution bounded)",
    "q165_roc_auc"          -> "distinct-score histogram + 2-row label table",
    "q193_equiheight_hist"  -> "distinct-value histogram of l_extendedprice (price-resolution bounded)",
    "q229_commit_window"    -> "distinct-commit list + per-commit aggregate (rows ∝ maintenance ops, never data)"
  )

  test("no registered query runs an unpartitioned WindowExec over unbounded input") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val windows = fn(spark, dir).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          // a limit below the window strictly bounds its input (the
          // limit-then-rank top-k idiom): k rows, never a data funnel
          !w.child.exists {
            case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
            case _ => false
          } => w
      }
      if (windows.nonEmpty && !boundedGlobalWindow.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned WindowExec over non-allowlisted input in: ${offenders.mkString(", ")} — " +
        "either partition the window, use the DistRank/histogram construction, " +
        "or (only if the input is provably bounded) add an allowlist entry with its bound")
  }
}

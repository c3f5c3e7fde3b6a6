package graft.store

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec

/** q185's claim is a PLAN property: the day-range predicate must prune
  * partition directories at planning time, not filter rows after a full
  * scan. */
class PartitionPruneSpec extends SparkSpec {

  test("q185 scans only the 3 selected day partitions out of ~30") {
    val q = Bucketing.q185PartitionPrune(spark, "/root/testdata/sf0.001")
    // sparkPlan: the pre-AQE physical plan (AQE wraps executedPlan in an
    // adaptive root whose children aren't collectible before execution)
    val scans = q.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no file scan found:\n${q.queryExecution.sparkPlan}")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"day predicate did not become a partition filter:\n${q.queryExecution.sparkPlan}")
    // the layout has ~30 day directories; the pruned scan must select 3
    assert(scan.relation.location.inputFiles.length >= 25,
      "fixture should have ~30 day partitions on disk")
    assert(scan.selectedPartitions.partitionCount == 3,
      s"expected 3 day partitions selected, got ${scan.selectedPartitions.partitionCount}")
    assert(q.count() > 0)
  }
}

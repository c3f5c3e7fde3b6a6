package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape assertions: the optimizations the 100 TB story depends on
  * must be visible in the physical plan, not just hoped for. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q01 pushes the raw-ns time range into the parquet scan") {
    val p = plan("q01_time_filter")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"))
  }

  test("q10 star join broadcasts all three dimensions") {
    val p = plan("q10_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q08 top-N compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q08_topn")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q05 aggregation is partial+final (map-side combine)") {
    val p = plan("q05_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q20 scan reads only the referenced part columns") {
    val p = plan("q20_string_fns")
    assert(p.contains("ReadSchema") && !p.contains("p_retailprice"))
  }

  test("q30 scan prunes the unused label column from embeddings") {
    val p = plan("q30_knn_exact")
    assert(p.contains("ReadSchema") && !p.contains("label"))
  }

  test("q62 argmax is a partial+final aggregate, not a window sort") {
    val p = plan("q62_argmax")
    assert(!p.contains("Window"))
    assert("HashAggregate|SortAggregate".r.findAllIn(p).size >= 2)
  }

  test("q87 latest-state is a partial+final argmax, not a window sort") {
    val p = plan("q87_latest_state")
    assert(!p.contains("Window"))
    assert(p.contains("partial_max"))
    assert("HashAggregate|SortAggregate".r.findAllIn(p).size >= 2)
  }

  test("q82 gap-fill spine derives from the materialized counts, not a raw rescan") {
    // the single raw-events scan happens eagerly when counts materialize;
    // the returned plan (spine + join) must not touch the parquet again
    val p = plan("q82_gap_fill")
    assert(!p.contains("events.parquet"))
  }

  test("q111 entropy reads the shared token checkpoint and combines map-side") {
    val p = plan("q111_entropy")
    // q111 now consumes the shared Toks checkpoint (doc_id, source, tok) —
    // column pruning moved to the cache build, which never reads n_chars
    assert(!p.contains("n_chars"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)        // partial+final token counts
  }

  test("q113 PMI joins the unigram dictionary by broadcast, never SMJ") {
    val p = plan("q113_pmi")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q115 centroid table broadcasts back; corpus never sort-merge-joins") {
    val p = plan("q115_label_centroid")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q116 importance sampling is a pure map: no aggregate, no join, text unread") {
    val p = plan("q116_importance_sample")
    assert(!p.contains("HashAggregate") && !p.contains("Join"))
    assert(!p.contains("text"))                             // 3-column scan only
  }

  test("q108 markov raw pass is one user-keyed window, then dimension-sized aggs") {
    val p = plan("q108_markov")
    assert(p.contains("Window"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q109 cusum never joins: day-grain aggregate plus calendar-sized windows") {
    val p = plan("q109_cusum")
    assert(!p.contains("Join"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q195 audio decode is map-only: no join, no window, codec inside MapPartitions") {
    val p = plan("q195_audio_decode")
    assert(p.contains("MapPartitions"))
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("q196 covariance never self-joins the corpus: broadcast joins over partials only") {
    val p = plan("q196_dim_covariance")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"))
    // every join leg builds from the checkpointed partials, all broadcast:
    // two dim-sum hash joins + the 1-row total as a broadcast cross
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q198 funnel sweep costs one user-keyed shuffle, same as single-window q83") {
    def exchanges(q: String) = "Exchange (?!SinglePartition)".r.findAllIn(plan(q)).size
    assert(!plan("q198_funnel_sweep").contains("Window"))
    assert(exchanges("q198_funnel_sweep") == exchanges("q83_funnel"),
      "the 3-window sweep must not add shuffles over the 1-window funnel")
  }

  test("q199 LTTB has no window and no join: aggregate then per-series flatMap") {
    val p = plan("q199_lttb_downsample")
    assert(!p.contains("Window") && !p.contains("Join"))
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"))
  }
}

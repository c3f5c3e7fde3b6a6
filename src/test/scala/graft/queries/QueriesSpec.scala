package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke over the full registered query set at sf0.001: every query runs,
  * has stable column names (the oracle compare is name-sensitive), and the
  * ones that must be non-empty are. Full value-level parity runs in the
  * driver's DuckDB gate (and locally via tools/check.py). */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // pair-finding / anti queries may legitimately be empty at tiny scale
  private val mayBeEmpty = Set("q26_lsh_pairs", "q28_trigram_jaccard",
    "q31_ann_lsh", "q13_anti_join", "q14_set_ops", "q22_range_join",
    "q106_containment", "q132_cross_source_leak")

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and vice-versa names are aligned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }
}

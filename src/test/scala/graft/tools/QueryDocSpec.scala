package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** QUERIES.md must stay in sync with the live query registry: a new or
  * renamed query without a regenerated index fails here with the
  * regeneration command, so the user-facing surface can't silently
  * drift from `SparkEntry.queries`. */
class QueryDocSpec extends AnyFunSuite {

  test("QUERIES.md matches the generated index") {
    val expected = QueryDoc.render()
    val p = java.nio.file.Paths.get("QUERIES.md")
    assert(java.nio.file.Files.exists(p), "QUERIES.md missing — run: sbt \"runMain graft.tools.QueryDocGen\"")
    val actual = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(actual == expected,
      "QUERIES.md is stale — run: sbt \"runMain graft.tools.QueryDocGen\"")
  }

  test("every registered query has a real one-liner, not a name echo") {
    val rendered = QueryDoc.render()
    // every query name appears as a row
    graft.SparkEntry.queries.keys.foreach { n =>
      assert(rendered.contains(s"| `$n` |"), s"$n missing from QUERIES.md")
    }
    // and none fell back to the name echo (empty module cell) — a query
    // def without a scaladoc renders `| \`q…\` |  | …` and must fail HERE,
    // not ship a description-free row
    val undocumented = rendered.linesIterator
      .filter(l => l.startsWith("| `q") && l.contains("` |  |")).toSeq
    assert(undocumented.isEmpty,
      s"queries without a definition-site scaladoc:\n${undocumented.mkString("\n")}")
  }

  test("COVERAGE.md's header count matches the live registry") {
    // QUERIES.md is sync-enforced above; COVERAGE.md's count drifted two
    // rounds running because nothing asserted it — derive it the same way
    val p = java.nio.file.Paths.get("COVERAGE.md")
    assert(java.nio.file.Files.exists(p), "COVERAGE.md missing")
    val head = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.take(10).mkString("\n")
    val n = graft.SparkEntry.queries.size
    assert(head.contains(s"$n registered queries"),
      s"COVERAGE.md header does not say '$n registered queries' — update the count when registering queries")
    val withOracle = graft.SparkEntry.oracleSql.size
    assert(head.contains(s"all $withOracle with oracles"),
      s"COVERAGE.md header does not say 'all $withOracle with oracles'")
  }

  test("firstSentence strips scaladoc markup") {
    assert(QueryDoc.firstSentence(
      " * Exact [[Dedup.exactByKey]] dedup over `doc_id`.\n * More text.") ==
      "Exact Dedup.exactByKey dedup over doc_id.")
  }
}

package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The calibration gate's contract: refuse non-stationary or
  * cross-regime comparisons loudly, normalize honestly otherwise. */
class BenchCompareSpec extends AnyFunSuite {
  import BenchCompare._

  private def art(qs: Map[String, Double], b: Double, a: Double) =
    Artifact(qs, Some(b), Some(a), "sf0.1")

  test("refuses when calibration drifted >2x within one artifact (the r8 exhibit)") {
    // round 8's own artifact: calib 0.405→0.183 — 2.2× within one run
    val cur = art(Map("q1" -> 1.0), 0.405, 0.183)
    val ref = art(Map("q1" -> 1.0), 0.3, 0.3)
    val e = compare(cur, ref)
    assert(e.isLeft && e.left.toOption.get.contains("WITHIN the current"))
  }

  test("refuses when the two artifacts' epochs diverge >2x") {
    val cur = art(Map("q1" -> 1.0), 0.15, 0.16)
    val ref = art(Map("q1" -> 1.0), 0.40, 0.38)
    val e = compare(cur, ref)
    assert(e.isLeft && e.left.toOption.get.contains("between artifacts"))
  }

  test("refuses when a side lacks calibration fields (pre-round-8 artifact)") {
    val cur = art(Map("q1" -> 1.0), 0.3, 0.3)
    val ref = Artifact(Map("q1" -> 1.0), None, None, "sf0.1")
    val e = compare(cur, ref)
    assert(e.isLeft && e.left.toOption.get.contains("no calibration"))
  }

  test("normalization divides out the epoch ratio; failed queries are excluded") {
    // current epoch is 1.5× slower (calib 0.45 vs 0.30); q1 "regressed"
    // 1.5× raw — exactly the host, so normalized must be 1.0
    val cur = art(Map("q1" -> 1.5, "q2" -> 2.0, "qf" -> -1.0, "only_cur" -> 9.0), 0.45, 0.45)
    val ref = art(Map("q1" -> 1.0, "q2" -> 1.0, "qf" -> 1.0), 0.30, 0.30)
    val r = compare(cur, ref).toOption.get
    assert(r.rows.map(_.name) == Seq("q1", "q2")) // common, non-failed only
    val q1 = r.rows.find(_.name == "q1").get
    assert(math.abs(q1.raw - 1.5) < 1e-9 && math.abs(q1.norm - 1.0) < 1e-9)
    val q2 = r.rows.find(_.name == "q2").get
    assert(math.abs(q2.norm - 2.0 / 1.5) < 1e-9)
    assert(math.abs(r.epochRatio - 1.5) < 1e-9)
    assert(markdown(r).contains("| q2 |")) // biggest normalized move leads
  }

  test("parses the Bench artifact shape") {
    val a = parse("""{"metric":"total","value":3.0,"queries":{"q1":1.25,"q2":-1.0},""" +
      """"calib_before":0.392,"calib_after":0.311,"sf":"/root/testdata/sf0.1"}""")
    assert(a.queries == Map("q1" -> 1.25, "q2" -> -1.0))
    assert(a.calibBefore.contains(0.392) && a.calibAfter.contains(0.311))
  }
}

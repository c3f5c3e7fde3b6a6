package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the two text-pipeline walkers added in round 7:
  * the Aho–Corasick automaton (vs a brute-force position scan on random
  * inputs — same oracle shape the DuckDB gate uses) and the HTML block
  * extractor (hand-built pages pinning block splits, anchor attribution,
  * word boundaries at tags, and malformed-markup degradation). */
class AcHtmlSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- Aho–Corasick
  private def brute(text: String, pats: Seq[String]): Seq[(Int, Int)] =
    for {
      (p, pid) <- pats.zipWithIndex
      i <- 0 to text.length - p.length
      if text.regionMatches(i, p, 0, p.length)
    } yield (pid, i + p.length) // 1-based end

  test("automaton matches brute force on random texts (overlaps, nesting, shared affixes)") {
    val pats = Seq("ab", "aba", "bab", "b", "abab", "ba")
    val ac = AcScan.build(pats)
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val text = Array.fill(rnd.nextInt(40))(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      ac.scan(text, (pid, end) => got += ((pid, end)))
      assert(got.sortBy(x => (x._1, x._2)) == brute(text, pats).sortBy(x => (x._1, x._2)),
        s"text=$text")
    }
  }

  test("self-overlapping needle counts every end position") {
    val ac = AcScan.build(Seq("batch batch"))
    var ends = List.empty[Int]
    ac.scan("batch batch batch batch", (_, e) => ends ::= e)
    assert(ends.sorted == List(11, 17, 23)) // three overlapping occurrences
  }

  test("chars outside the needle alphabet reset cleanly, never throw") {
    val ac = AcScan.build(Seq("abc"))
    var n = 0
    ac.scan("xxabcXabcéabc", (_, _) => n += 1)
    assert(n == 3)
  }

  test("the needle dictionary is well-formed (distinct, non-empty, SQL-safe)") {
    assert(AcScan.needles.distinct.size == AcScan.needles.size)
    assert(AcScan.needles.forall(_.nonEmpty))
    assert(AcScan.needles.forall(!_.contains("'"))) // embedded verbatim in the oracle VALUES list
  }

  // ---------------------------------------------------------------- HTML extraction
  test("blocks split on div/p; anchors attribute chars without splitting") {
    val html = "<div><a href=\"/x\">home</a> plain</div><p>alpha <a href=\"#\">beta</a> gamma</p>"
    val bs = HtmlExtract.extractBlocks(1L, html)
    assert(bs.length == 2)
    val nav = bs.head
    assert(nav.chars == "home plain".length && nav.link_chars == 4 && nav.words == 2)
    val p = bs(1)
    assert(p.chars == "alpha beta gamma".length && p.link_chars == 4 && p.words == 3)
  }

  test("tag boundaries break words; unknown tags do not split blocks") {
    val bs = HtmlExtract.extractBlocks(1L, "<p>ab<b>cd</b>ef gh</p>")
    assert(bs.length == 1)
    // ab|cd|ef are three words (tags break words), gh the fourth
    assert(bs.head.words == 4 && bs.head.chars == 9 && bs.head.link_chars == 0)
  }

  test("malformed markup degrades: unclosed tag at EOF keeps completed blocks") {
    val bs = HtmlExtract.extractBlocks(1L, "<p>done</p><p>partial<a href")
    assert(bs.map(_.chars) == Seq(4, 7))
    assert(HtmlExtract.extractBlocks(1L, "").isEmpty)
    assert(HtmlExtract.extractBlocks(1L, "no tags at all").isEmpty) // text outside blocks ignored
  }

  test("synth page round-trips the density verdicts the oracle predicts") {
    val text = (0 until 43).map(i => s"tok$i").mkString(" ") // 43 tokens → 3 paragraphs
    val bs = HtmlExtract.extractBlocks(9L, HtmlExtract.synthHtml(text))
    // nav + 3 paragraphs + footer
    assert(bs.length == 5)
    val nav = bs.head; val foot = bs.last
    assert(nav.chars == 10 && nav.link_chars == 9 && nav.words == 2)
    assert(foot.chars == 13 && foot.link_chars == 12 && foot.words == 2)
    assert(2 * nav.link_chars > nav.chars && 2 * foot.link_chars > foot.chars) // both dropped
    val paras = bs.slice(1, 4)
    assert(paras.map(_.words) == Seq(20, 20, 3))
    paras.zipWithIndex.foreach { case (b, p) =>
      val toks = text.split(" ").slice(p * 20, p * 20 + 20)
      assert(b.chars == toks.map(_.length).sum + toks.length - 1, s"para $p chars")
      val linkLen = toks.zipWithIndex.collect {
        case (t, k) if (p * 20 + k) % 7 == 0 => t.length }.sum
      assert(b.link_chars == linkLen, s"para $p links")
    }
  }

  test("multi-space text: empty split tokens add chars but never words (oracle parity)") {
    // "a  b" splits to ["a", "", "b"]: the synth page renders "a  b" (the
    // empty token contributes its separator space), the walker counts 2
    // word RUNS and 4 chars — and the oracle formula must agree:
    // chars = sum(len) + count − 1 = 2 + 3 − 1 = 4; words = nonempty = 2
    val bs = HtmlExtract.extractBlocks(5L, HtmlExtract.synthHtml("a  b"))
    val para = bs(1) // nav, para, footer
    assert(para.chars == 4, s"chars ${para.chars}")
    assert(para.words == 2, s"words ${para.words}")
    // leading/trailing spaces: ["", "x", ""] → 3 chars ("␣x␣"), 1 word
    val bs2 = HtmlExtract.extractBlocks(6L, HtmlExtract.synthHtml(" x "))
    assert(bs2(1).chars == 3 && bs2(1).words == 1)
  }

  test("degenerate all-anchor last paragraph is dropped by the integer verdict") {
    // 21 tokens: last paragraph = 1 token at global idx 20, and 21 % 7 != 0…
    // pick 36 tokens: last para = idx 20..35 — need a 1-token para whose
    // global idx % 7 == 0: 21 tokens gives last para idx 20 (20%7=6, kept);
    // 15 tokens in para grain 20 is one para; use grain: 20·k + 1 with
    // (20k) % 7 == 0 → k = 7 → 141 tokens.
    val text = (0 until 141).map(_ => "zz").mkString(" ")
    val bs = HtmlExtract.extractBlocks(3L, HtmlExtract.synthHtml(text))
    val last = bs(bs.length - 2) // before footer
    assert(last.words == 1 && last.link_chars == last.chars) // all anchor
    assert(2 * last.link_chars > last.chars) // dropped, as the oracle computes
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** HTML main-text extraction with link-density boilerplate removal — the
  * step a web-crawl training pipeline runs before any dedup/quality op:
  * strip markup, segment into blocks, and drop chrome (nav bars, footers,
  * link farms) by the classic link-density heuristic (a block whose
  * visible characters are mostly anchor text is navigation, not content —
  * the Kohlschütter boilerplate observation reduced to its one strongest
  * feature). No HTML library exists in this sandbox and none is needed:
  * like the container walks ([[Mp4]], [[Adts]]), this is a single-cursor
  * character walk — tags split blocks (`div`/`p` open/close), anchor
  * spans attribute their visible chars to the block's link tally, and
  * the walker never buffers more than the current block's counters.
  *
  * Scale contract: synth + walk + per-block counters run partition-local
  * inside one `mapPartitions` (one document held at a time); the density
  * verdict is an integer predicate (2·link ≤ total ⇔ density ≤ 0.5, no
  * floats); the per-doc aggregate is map-side combined. At 100 TB the
  * corpus is read once, nothing shuffles except the per-doc rollup.
  */
object HtmlExtract {

  /** Per-block extraction counters: visible chars, visible chars inside
    * anchors, and whitespace-separated visible words. */
  final case class Block(doc_id: Long, block_idx: Int, chars: Int,
                         link_chars: Int, words: Int)

  /** Walk the markup once; emit one [[Block]] per `div`/`p` element.
    * Anchors (`a`) are inline: they do not open blocks, their visible
    * text counts toward BOTH `chars` and `link_chars`. Unknown tags are
    * skipped as markup but do not split blocks. Text outside any block
    * is ignored (synth emits none; real crawls carry stray whitespace).
    * Malformed markup (unclosed tag at EOF) ends the walk with whatever
    * blocks completed — degrade, never throw. */
  def extractBlocks(docId: Long, html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    var i = 0
    val n = html.length
    var inBlock = false
    var blockIdx = 0
    var chars = 0; var links = 0; var words = 0
    var linkDepth = 0
    var inWord = false
    def closeBlock(): Unit = if (inBlock) {
      out += Block(docId, blockIdx, chars, links, words)
      blockIdx += 1; inBlock = false; chars = 0; links = 0; words = 0
      inWord = false; linkDepth = 0
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = i + 1 < n && html.charAt(i + 1) == '/'
        val nameStart = if (close) i + 2 else i + 1
        var j = nameStart
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        val name = html.substring(nameStart, j).toLowerCase
        val end = html.indexOf('>', j)
        if (end < 0) { closeBlock(); return out.toSeq } // truncated tag
        name match {
          case "div" | "p" =>
            closeBlock()
            if (!close) inBlock = true
          case "a" =>
            if (inBlock) { linkDepth += (if (close) -1 else 1); if (linkDepth < 0) linkDepth = 0 }
          case _ => // unknown tag: markup skipped, block uninterrupted
        }
        inWord = false // a tag boundary breaks a word
        i = end + 1
      } else {
        if (inBlock) {
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') inWord = false
          else { if (!inWord) { words += 1; inWord = true } }
          chars += 1
          if (linkDepth > 0) links += 1
        }
        i += 1
      }
    }
    closeBlock()
    out.toSeq
  }

  // ------------------------------------------------------------- deterministic synthesis
  /** Wrap a document's tokens in the page shape every crawler sees:
    * a nav div (anchor-dominated → must be dropped), `<p>` paragraphs of
    * 20 tokens with every 7th GLOBAL token wrapped in an anchor (content
    * with incidental links → must be kept, except a degenerate last
    * paragraph that is all anchor), and a footer div (dropped). Visible
    * paragraph text is exactly the original token run, so the oracle
    * reproduces every counter from `text` alone. */
  def synthHtml(text: String): String = {
    val toks = text.split(" ", -1)
    val sb = new StringBuilder
    sb ++= "<html><body><div class=\"nav\"><a href=\"/h\">home</a> <a href=\"/a\">about</a></div>"
    toks.grouped(20).zipWithIndex.foreach { case (para, p) =>
      sb ++= "<p>"
      para.zipWithIndex.foreach { case (t, k) =>
        val gi = p * 20 + k
        if (k > 0) sb += ' '
        if (gi % 7 == 0) { sb ++= "<a href=\"#\">"; sb ++= t; sb ++= "</a>" }
        else sb ++= t
      }
      sb ++= "</p>"
    }
    sb ++= "<div class=\"footer\"><a href=\"/t\">terms</a> <a href=\"/p\">privacy</a></div></body></html>"
    sb.toString
  }

  // ------------------------------------------------------------- q216: extraction census through the gate
  /** REAL extraction through the DuckDB gate: synthesize the page
    * ([[synthHtml]]), walk it back ([[extractBlocks]]), apply the
    * integer link-density verdict, and emit per-doc counters. The oracle
    * recomputes every number from the raw text (paragraph grouping,
    * global 7-stride anchor lengths, the two constant chrome blocks) —
    * a walker that splits blocks on anchors, loses the word/char tally
    * at tag boundaries, misattributes anchor chars, or botches the
    * degenerate all-anchor last paragraph hash-mismatches. */
  def q216HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(rows => rows.flatMap { case (id, text) =>
        extractBlocks(id, synthHtml(text))
      })
      .toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("link_chars") * 2 <= col("chars"), 1L).otherwise(0L)).as("kept_blocks"),
        sum(when(col("link_chars") * 2 <= col("chars"), col("chars").cast("long"))
          .otherwise(0L)).as("kept_chars"),
        sum(when(col("link_chars") * 2 <= col("chars"), col("words").cast("long"))
          .otherwise(0L)).as("kept_words"),
        sum(col("link_chars").cast("long")).as("link_chars_all"))
      .orderBy(col("doc_id"))
  }

  val q216Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |ex AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS idx, unnest(tk) AS tok FROM tk),
      |para AS (
      |  SELECT doc_id, idx // 20 AS p,
      |         (sum(length(tok)) + count(*) - 1)::BIGINT AS chars,
      |         sum(CASE WHEN idx % 7 = 0 THEN length(tok) ELSE 0 END)::BIGINT AS links,
      |         -- the walker counts visible character RUNS: an empty token
      |         -- (consecutive/leading/trailing spaces in text) contributes a
      |         -- space to chars but NO word — count(*) would overcount it
      |         sum(CASE WHEN length(tok) > 0 THEN 1 ELSE 0 END)::BIGINT AS words
      |  FROM ex GROUP BY doc_id, idx // 20),
      |chrome AS (
      |  SELECT doc_id, 10::BIGINT AS chars, 9::BIGINT AS links, 2::BIGINT AS words FROM documents
      |  UNION ALL
      |  SELECT doc_id, 13::BIGINT, 12::BIGINT, 2::BIGINT FROM documents),
      |blocks AS (SELECT doc_id, chars, links, words FROM para
      |           UNION ALL SELECT doc_id, chars, links, words FROM chrome)
      |SELECT doc_id, count(*)::BIGINT AS n_blocks,
      |  sum(CASE WHEN 2 * links <= chars THEN 1 ELSE 0 END)::BIGINT AS kept_blocks,
      |  sum(CASE WHEN 2 * links <= chars THEN chars ELSE 0 END)::BIGINT AS kept_chars,
      |  sum(CASE WHEN 2 * links <= chars THEN words ELSE 0 END)::BIGINT AS kept_words,
      |  sum(links)::BIGINT AS link_chars_all
      |FROM blocks GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q216_html_extract", q216HtmlExtract _, Some(q216Sql)),
  )
}

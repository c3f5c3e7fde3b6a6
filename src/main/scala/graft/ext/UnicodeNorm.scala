package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Unicode normalization through the gate — a multilingual corpus mixes
  * precomposed codepoints (é = U+00E9) and base+combining-mark sequences
  * (e + U+0301) for the SAME visible text, so every byte-exact op
  * downstream (dedup keys, needle scans, token stats) under-merges until
  * the text is put in one canonical form. q219 pins the native
  * [[graft.functions.NfcNormalizeExpr]] (JDK Normalizer) against
  * DuckDB's independent `nfc_normalize` implementation — two unrelated
  * Unicode libraries must agree on every composed string, codepoint
  * count, and on what NFC must NOT touch (compatibility characters:
  * fullwidth forms, ligatures — those are NFKC's lossier business,
  * exposed separately as `nfkc_normalize`). */
object UnicodeNorm {

  /** Codepoint recipe piece `x ∈ [0,7)` — mixes composing sequences
    * (0,2,5,6), an already-precomposed char (1), and NFC-invariant
    * compatibility chars (3,4). Built from EXPLICIT codepoints (a source
    * literal can silently normalize under an editor or formatter) and
    * mirrored 1:1 by the SQL `chr()` table. */
  private def cp(points: Int*): String =
    points.flatMap(pt => Character.toChars(pt).toSeq).mkString

  private def piece(x: Long): String = x match {
    case 0 => cp(0x65, 0x0301) // e + combining acute (composes)
    case 1 => cp(0xE9)         // precomposed e-acute (already NFC)
    case 2 => cp(0x6F, 0x0308) // o + combining diaeresis (composes)
    case 3 => cp(0xFF21)       // fullwidth A (NFC keeps)
    case 4 => cp(0xFB01)       // fi ligature (NFC keeps)
    case 5 => cp(0x6E, 0x0303) // n + combining tilde (composes)
    case _ => cp(0x41, 0x030A) // A + combining ring (composes)
  }

  def synthMessy(id: Long): String =
    "data" + piece(id % 7) + "-" + piece(id * 3 % 7) + "-" + piece(id * 5 % 7)

  /** Unicode NFC normalization through the gate: explicit-codepoint messy
    * strings (seed = doc_id) normalized by the native codegen
    * nfc_normalize expression (JDK Normalizer) must match DuckDB's
    * independent nfc_normalize on every composed string and codepoint
    * count — including the compatibility characters NFC must leave
    * untouched. */
  def q219UnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .map(id => (id, synthMessy(id)))
      .toDF("doc_id", "messy")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.nfc_normalize(col("messy")).as("norm"),
        length(col("messy")).as("cp_before"))
      .withColumn("cp_after", length(col("norm")))
      .orderBy(col("doc_id"))
  }

  val q219Sql: String =
    """WITH p(x, s) AS (VALUES
      |  (0, 'e' || chr(769)), (1, chr(233)), (2, 'o' || chr(776)),
      |  (3, chr(65313)), (4, chr(64257)), (5, 'n' || chr(771)),
      |  (6, 'A' || chr(778))),
      |m AS (SELECT d.doc_id,
      |        'data' || p1.s || '-' || p2.s || '-' || p3.s AS messy
      |      FROM documents d
      |      JOIN p p1 ON p1.x = d.doc_id % 7
      |      JOIN p p2 ON p2.x = (d.doc_id * 3) % 7
      |      JOIN p p3 ON p3.x = (d.doc_id * 5) % 7)
      |SELECT doc_id, nfc_normalize(messy) AS norm,
      |  length(messy)::INTEGER AS cp_before,
      |  length(nfc_normalize(messy))::INTEGER AS cp_after
      |FROM m ORDER BY doc_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q219_unicode_norm", q219UnicodeNorm _, Some(q219Sql)),
  )
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Unit coverage for the round-7 retrieval/normalization additions:
  * NFKC (not oracle-covered — DuckDB has no NFKC) and a planted-fixture
  * BM25 ranking property the closed-form gate can't express. */
class RetrievalNormSpec extends SparkSpec {

  test("nfc composes; nfkc additionally folds compatibility chars") {
    import spark.implicits._
    def s(points: Int*) = points.flatMap(p => Character.toChars(p).toSeq).mkString
    val rows = Seq(
      (1L, s(0x65, 0x0301)), // e + combining acute
      (2L, s(0xFF21)),       // fullwidth A
      (3L, s(0xFB01)),       // fi ligature
      (4L, "plain")).toDF("id", "t")
      .select(col("id"), GraftFunctions.nfc_normalize(col("t")).as("nfc"),
        GraftFunctions.nfkc_normalize(col("t")).as("nfkc"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1L) == (s(0xE9), s(0xE9)))      // both compose
    assert(rows(2L) == (s(0xFF21), "A"))        // NFC keeps, NFKC folds
    assert(rows(3L) == (s(0xFB01), "fi"))       // NFC keeps, NFKC expands
    assert(rows(4L) == ("plain", "plain"))
    // null safety through the native expression
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(GraftFunctions.nfc_normalize(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("bm25: tf saturation and idf rank planted docs correctly") {
    import spark.implicits._
    val dir = tmpDir("bm25-fix")
    // qid 2 is ("hash", "join"); plant:
    //  - doc 1: both terms, twice each       → best
    //  - doc 2: both terms once              → second
    //  - doc 3: only "hash", many times      → saturated single-term, below both
    //  - doc 4+: filler without query terms (drives df down, never scored)
    val filler = (4L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val docs = Seq(
      (1L, "hash join hash join alpha beta"),
      (2L, "hash join alpha beta gamma delta"),
      (3L, "hash hash hash hash hash hash")) ++ filler
    docs.map { case (i, t) => (i, t, "en", "s", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Bm25.q218Bm25TopK(spark, dir)
      .filter(col("qid") === 2).orderBy(col("rank"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(got.take(3) == Seq(1L, 2L, 3L), s"got $got")
  }
}

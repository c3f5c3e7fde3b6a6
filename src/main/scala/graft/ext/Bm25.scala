package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BM25 ranked retrieval — the lexical scorer behind retrieval-based
  * data work (mining hard negatives, dedup-aware sampling, building
  * retrieval eval sets) and the lexical leg RRF fusion (q183) usually
  * takes instead of raw tf·idf. Lucene-shaped formula: per query term,
  * idf = ln((N − df + 0.5)/(df + 0.5) + 1), tf saturation
  * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)), k1 = 1.2, b = 0.75.
  *
  * Engine-exactness: each term contribution is fixed to integer
  * micro-units the moment it is computed (round(idf·sat·10⁶), the q167
  * pattern), so the per-(query, doc) SCORE is an exact BIGINT sum —
  * no float-summation ordering anywhere, and the rank tiebreak
  * (score_e6 desc, doc_id) is total on both engines.
  *
  * Scale: the query-term dictionary is broadcast and FILTERS the token
  * scan before any aggregation, so tf, df and the score join are all
  * query-term-bounded, not vocabulary-bounded; the only corpus-wide
  * aggregates are dl (per-doc length, map-side combined) and its 1-row
  * stats. The top-k window partitions by query id — bounded by k·|Q|. */
object Bm25 {

  /** The fixed query workload (id = position + 1). */
  val queries: Seq[Seq[String]] = Seq(
    Seq("table", "scan"),
    Seq("hash", "join"),
    Seq("stream", "window", "batch"),
    Seq("sort", "merge"),
    Seq("filter", "customer"),
    Seq("spark", "query"))

  /** BM25 top-10 per query over the fixed workload: Lucene-shaped
    * idf × tf-saturation per query term, each contribution fixed to
    * integer micro-units before summing so the score is an exact BIGINT
    * on both engines; the broadcast query-term dictionary filters the
    * token scan so tf/df/scoring stay query-bounded, and the rank window
    * partitions by query id. */
  def q218Bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qterms = broadcast(queries.zipWithIndex
      .flatMap { case (ts, i) => ts.map(t => ((i + 1).toLong, t)) }
      .toDF("qid", "tok"))
    val termSet = queries.flatten.distinct
    val toks = Toks(s, dir).select(col("doc_id"), col("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = broadcast(dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")))
    val tfq = toks.filter(col("tok").isin(termSet: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dft = broadcast(tfq.groupBy(col("tok")).agg(count(lit(1)).as("df")))
    val contrib = tfq
      .join(qterms, Seq("tok"))
      .join(dft, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .withColumn("idf",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("sat",
        col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .withColumn("c_e6", round(col("idf") * col("sat") * 1e6).cast("long"))
    contrib
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c_e6")).as("score_e6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score_e6").desc, col("doc_id"))))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_e6"))
      .orderBy(col("qid"), col("rank"))
  }

  val q218Sql: String = {
    val vals = queries.zipWithIndex
      .flatMap { case (ts, i) => ts.map(t => s"(${i + 1}, '$t')") }.mkString(", ")
    s"""WITH qt(qid, tok) AS (VALUES $vals),
       |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks
       |       WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY doc_id, tok),
       |dft AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
       |c AS (SELECT qt.qid, tf.doc_id,
       |        CAST(round(ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
       |          * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
       |          * 1e6) AS BIGINT) AS c_e6
       |      FROM tf JOIN qt USING (tok) JOIN dft USING (tok)
       |           JOIN dl USING (doc_id) CROSS JOIN stats),
       |sc AS (SELECT qid, doc_id, sum(c_e6)::BIGINT AS score_e6 FROM c GROUP BY qid, doc_id),
       |rk AS (SELECT qid, doc_id, score_e6,
       |         row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS rank
       |       FROM sc)
       |SELECT qid::BIGINT AS qid, rank::BIGINT AS rank, doc_id, score_e6
       |FROM rk WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q218_bm25_topk", q218Bm25TopK _, Some(q218Sql)),
  )
}

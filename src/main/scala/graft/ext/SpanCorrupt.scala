package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables
import graft.functions.TextHash

/** Span-corruption data preparation (the T5/UL2 denoising objective):
  * deterministically select token spans to mask, split each document into
  * an INPUT sequence (unmasked tokens, spans replaced by sentinels) and a
  * TARGET sequence (the masked spans) — the (input, target) pair a
  * seq-to-seq pretraining pipeline materializes at corpus scale.
  *
  * Selection is pure arithmetic, no RNG state: token triple g (= idx÷3)
  * of doc d masks iff (d·31 + g) % 7 == 0 (≈ 14% of tokens, mean span 3),
  * so executors decide row-locally — the same property the thinning
  * sampler relies on ([[graft.store.TraceStore.thinExpired]]). A SPAN is
  * a maximal run of masked triples, and "is g a span start" is itself
  * closed-form ((d·31 + g − 1) % 7 ≠ 0 or g = 0) — no window needed for
  * span counting. The gate pins the exact content split with tokval
  * checksums: Σ tokval over input tokens, over target tokens, and a
  * position-weighted target sum that pins the target's token ORDER.
  *
  * Scale: one token explode (the shared [[Toks]] shape) → map-side
  * combined per-doc aggregate; the only window partitions by doc_id
  * (doc-length-bounded) to rank target tokens. */
object SpanCorrupt {

  /** Per-doc span-corruption statistics and content checksums through
    * the DuckDB gate: n_tokens/n_masked/n_spans plus exact tokval sums
    * over the input and target splits (position-weighted on the target,
    * pinning order) — a masker that shifted a span boundary, merged runs
    * wrong, or emitted target tokens out of order hash-mismatches. */
  def q220SpanCorrupt(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("idx", "tok")))
      .withColumn("g", (col("idx") / 3).cast("long"))
      .withColumn("masked", (col("doc_id") * 31 + col("g")) % 7 === 0)
      .withColumn("span_start", col("masked") &&
        (col("g") === 0 || (col("doc_id") * 31 + col("g") - 1) % 7 =!= 0))
      .withColumn("tv", TextHash.tokval(col("tok")))
    val base = toks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
      countDistinct(when(col("span_start"), col("g"))).as("n_spans"),
      sum(when(!col("masked"), col("tv")).otherwise(0L)).as("sum_tv_input"))
    val tgt = toks.filter(col("masked"))
      .withColumn("j", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("idx"))))
      .groupBy(col("doc_id")).agg(
        sum(col("tv")).as("sum_tv_target"),
        sum(col("tv") * col("j")).as("sum_tv_target_posw"))
    base.join(tgt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"),
        col("sum_tv_input"),
        coalesce(col("sum_tv_target"), lit(0L)).as("sum_tv_target"),
        coalesce(col("sum_tv_target_posw"), lit(0L)).as("sum_tv_target_posw"))
      .orderBy(col("doc_id"))
  }

  val q220Sql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |ex AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS idx, unnest(tk) AS tok FROM tk),
       |t AS (SELECT doc_id, idx, idx // 3 AS g,
       |        (doc_id * 31 + idx // 3) % 7 = 0 AS masked,
       |        ${TextHash.tokvalSql("tok")} AS tv
       |      FROM ex),
       |base AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |    sum(CASE WHEN masked THEN 1 ELSE 0 END)::BIGINT AS n_masked,
       |    count(DISTINCT CASE WHEN masked AND (g = 0 OR (doc_id * 31 + g - 1) % 7 <> 0)
       |                        THEN g END)::BIGINT AS n_spans,
       |    sum(CASE WHEN NOT masked THEN tv ELSE 0 END)::BIGINT AS sum_tv_input
       |  FROM t GROUP BY doc_id),
       |tgt AS (SELECT doc_id, sum(tv)::BIGINT AS sum_tv_target,
       |    sum(tv * j)::BIGINT AS sum_tv_target_posw
       |  FROM (SELECT doc_id, tv,
       |          row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS j
       |        FROM t WHERE masked) GROUP BY doc_id)
       |SELECT b.doc_id, n_tokens, n_masked, n_spans, sum_tv_input,
       |  coalesce(sum_tv_target, 0)::BIGINT AS sum_tv_target,
       |  coalesce(sum_tv_target_posw, 0)::BIGINT AS sum_tv_target_posw
       |FROM base b LEFT JOIN tgt USING (doc_id) ORDER BY doc_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q220_span_corrupt", q220SpanCorrupt _, Some(q220Sql)),
  )
}

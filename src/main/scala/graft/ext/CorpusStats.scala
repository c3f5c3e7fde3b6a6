package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Corpus-level statistics over the documents table — the measurements a
  * training-data pipeline runs to characterize a crawl before mixing it
  * (distribution entropy, vocabulary growth, collocation strength).
  * Extends SURVEY.md §2 Tier C4 (text analysis) at the corpus grain.
  *
  * Scale design: everything funnels through ONE token explosion of the
  * corpus followed by hash aggregations keyed on the token (map-side
  * partial combine absorbs the Zipf head before the shuffle — "the" is
  * pre-counted per partition, so the shuffle carries ≤|vocab| rows per
  * partition, not |corpus| rows). The post-aggregation tables are
  * vocabulary-sized (≪ corpus), so window passes over them are free.
  * Float statistics are either derived from exact integer counts in a
  * single expression (deterministic across engines) or rounded at 4dp
  * where a small float sum is unavoidable (q45/q58 precedent).
  */
object CorpusStats {

  private def toks(s: SparkSession, dir: String): DataFrame = Toks(s, dir)

  // ---------------------------------------------------------------- q111: distribution entropy
  /** Per-source unigram Shannon entropy (nats) and its normalized form
    * H/ln(V) — the standard "how diverse is this slice" screen before
    * weighting a mixture. Token counts are exact integers; the entropy
    * sum runs over the vocabulary-sized count table only. */
  def q111Entropy(s: SparkSession, dir: String): DataFrame = {
    val counts = toks(s, dir)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    counts
      .withColumn("tot", sum(col("c")).over(Window.partitionBy(col("source"))))
      .withColumn("p", col("c").cast("double") / col("tot").cast("double"))
      .groupBy(col("source"))
      .agg(max(col("tot")).as("n_tok"),
           count(lit(1)).as("vocab"),
           round(-sum(col("p") * log(col("p"))), 4).as("entropy"))
      // vocab=1 ⇒ ln(V)=0: normalized entropy is undefined (NULL), and the
      // raw division would throw under ANSI mode
      .withColumn("norm_entropy",
        when(col("vocab") > 1,
          round(col("entropy") / log(col("vocab").cast("double")), 4)))
      .orderBy(col("source"))
  }

  val q111Sql: String =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
      |p AS (SELECT source, c,
      |             c::DOUBLE / sum(c) OVER (PARTITION BY source) AS p,
      |             sum(c) OVER (PARTITION BY source) AS tot
      |      FROM c),
      |h AS (SELECT source, CAST(max(tot) AS BIGINT) AS n_tok, count(*) AS vocab,
      |             round(-sum(p * ln(p)), 4) AS entropy
      |      FROM p GROUP BY source)
      |SELECT source, n_tok, vocab, entropy,
      |       CASE WHEN vocab > 1
      |            THEN round(entropy / ln(vocab::DOUBLE), 4) END AS norm_entropy
      |FROM h ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q112: vocabulary growth
  /** Heaps-law vocabulary-growth curve: walking the corpus in doc_id
    * order, cumulative token count vs cumulative distinct-token count at
    * every 100-doc checkpoint. Distinct growth is computed WITHOUT any
    * per-prefix re-scan: each token's first-occurrence doc (min doc_id,
    * one token-keyed aggregation) assigns it to the bucket that
    * introduced it; running sums over the ~|corpus|/100 bucket table do
    * the rest. The bucket table still scales with the corpus, so the
    * running sums use q97's two-pass sweep: per-block (1024 buckets)
    * totals → broadcast prefix offsets, then block-partitioned running
    * sums — the only unpartitioned window left runs over the
    * corpus/102400 block table. All integers — exact at any scale. */
  def q112VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // integer DIV, not double /: the double path truncates toward zero
    // and loses exactness past 2^53 — the oracle's doc_id // 100 is
    // floor-division on BIGINTs, so match it exactly
    val perBucket = docs
      .groupBy(expr("doc_id DIV 100").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " "))).cast("long").as("n_tok"))
    val newTok = toks(s, dir)
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr("first_doc DIV 100").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    val buckets = perBucket.join(newTok, Seq("bucket"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("blk", expr("bucket DIV 1024"))
    val wOff = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = buckets.groupBy(col("blk"))
      .agg(sum(col("n_docs")).as("bd"), sum(col("n_tok")).as("bt"),
           sum(col("n_new")).as("bn"))
      .select(col("blk"),
        coalesce(sum(col("bd")).over(wOff), lit(0L)).as("off_docs"),
        coalesce(sum(col("bt")).over(wOff), lit(0L)).as("off_tok"),
        coalesce(sum(col("bn")).over(wOff), lit(0L)).as("off_new"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets.join(broadcast(off), Seq("blk"))
      .withColumn("cum_docs", sum(col("n_docs")).over(wIn) + col("off_docs"))
      .withColumn("cum_tok", sum(col("n_tok")).over(wIn) + col("off_tok"))
      .withColumn("cum_vocab", sum(col("n_new")).over(wIn) + col("off_new"))
      .withColumn("ttr",
        round(col("cum_vocab").cast("double") / col("cum_tok").cast("double"), 6))
      .select(col("bucket"), col("cum_docs"), col("cum_tok"),
              col("cum_vocab"), col("ttr"))
      .orderBy(col("bucket"))
  }

  val q112Sql: String =
    """WITH b AS (SELECT CAST(doc_id // 100 AS BIGINT) AS bucket,
      |                  count(*) AS n_docs,
      |                  sum(len(string_split(text, ' '))) AS n_tok
      |           FROM documents GROUP BY 1),
      |f AS (SELECT tok, min(doc_id) AS first_doc
      |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |            FROM documents) t
      |      GROUP BY tok),
      |nv AS (SELECT CAST(first_doc // 100 AS BIGINT) AS bucket, count(*) AS n_new
      |       FROM f GROUP BY 1)
      |SELECT bucket,
      |       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
      |       CAST(sum(n_tok) OVER w AS BIGINT) AS cum_tok,
      |       CAST(sum(coalesce(n_new, 0)) OVER w AS BIGINT) AS cum_vocab,
      |       round((sum(coalesce(n_new, 0)) OVER w)::DOUBLE
      |             / (sum(n_tok) OVER w)::DOUBLE, 6) AS ttr
      |FROM b LEFT JOIN nv USING (bucket)
      |WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q113: PMI collocations
  /** Top-25 adjacent-bigram collocations by pointwise mutual information,
    * PMI = ln(p(ab) / (p(a)·p(b))) — the classic phrase detector. One
    * positional explode produces adjacent pairs; bigram and unigram
    * count tables are vocabulary-sized; PMI is a single float expression
    * over exact integer counts. A count floor (n_ab ≥ 40) keeps the
    * estimator out of the noisy tail, and ranking uses the ROUNDED score
    * with a lexicographic tie-break so both engines pick the same 25. */
  def q113Pmi(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val bi = docs
      .filter(size(col("tk")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("a"),
                    element_at(col("tk"), i + 1).as("b")))).as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val uni = toks(s, dir).groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val nTok = uni.agg(sum(col("n")).as("n_uni"))
    val nBi = bi.agg(sum(col("n_ab")).as("n_big"))
    val scored = bi.filter(col("n_ab") >= 40)
      .join(broadcast(uni.withColumnRenamed("tok", "a").withColumnRenamed("n", "n_a")), Seq("a"))
      .join(broadcast(uni.withColumnRenamed("tok", "b").withColumnRenamed("n", "n_b")), Seq("b"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .withColumn("pmi", round(
        log(col("n_ab").cast("double") / col("n_big").cast("double")
          / (col("n_a").cast("double") / col("n_uni").cast("double"))
          / (col("n_b").cast("double") / col("n_uni").cast("double"))), 4))
    // top-25 as TakeOrderedAndProject THEN a 25-row rank — never a
    // corpus-grain global row_number window: the limit is a distributed
    // per-partition top-k + k-row merge, and the rank window only ever
    // sees the 25 survivors (the (pmi, a, b) order is total, so
    // limit-then-rank ≡ rank-then-filter row-for-row)
    scored
      .orderBy(col("pmi").desc, col("a"), col("b")).limit(25)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("pmi").desc, col("a"), col("b"))))
      .select(col("rn"), col("a"), col("b"), col("n_ab"), col("pmi"))
      .orderBy(col("rn"))
  }

  val q113Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bi AS (SELECT tk[i] AS a, tk[i+1] AS b
      |       FROM tk, unnest(range(1, len(tk))) AS u(i)
      |       WHERE len(tk) >= 2),
      |bc AS (SELECT a, b, count(*) AS n_ab FROM bi GROUP BY 1, 2),
      |uni AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |uc AS (SELECT tok, count(*) AS n FROM uni GROUP BY tok),
      |tot AS (SELECT (SELECT sum(n) FROM uc) AS n_uni,
      |               (SELECT sum(n_ab) FROM bc) AS n_big),
      |scored AS (SELECT bc.a, bc.b, bc.n_ab,
      |                  round(ln(bc.n_ab::DOUBLE / t.n_big::DOUBLE
      |                        / (ua.n::DOUBLE / t.n_uni::DOUBLE)
      |                        / (ub.n::DOUBLE / t.n_uni::DOUBLE)), 4) AS pmi
      |           FROM bc CROSS JOIN tot t
      |           JOIN uc ua ON ua.tok = bc.a
      |           JOIN uc ub ON ub.tok = bc.b
      |           WHERE bc.n_ab >= 40)
      |SELECT row_number() OVER (ORDER BY pmi DESC, a, b) AS rn,
      |       a, b, n_ab, pmi
      |FROM scored
      |QUALIFY rn <= 25
      |ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- q119: Zipf fit (regr_* aggregates)
  /** Zipf-law fit per source: OLS slope/intercept/R² of ln(freq) on
    * ln(rank) over each source's 200 most frequent tokens — natural text
    * slopes ≈ −1; far-off slopes flag templated or synthetic slices.
    * Exercises the SQL:2016 linear-regression aggregate family
    * (regr_slope / regr_intercept / regr_r2) as single-pass co-moment
    * aggregates; ranks are deterministic (count desc, token tie-break),
    * and the window input is the vocabulary-sized count table. */
  def q119ZipfFit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("tok"))
    val ranked = toks(s, dir)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 200)
      .select(col("source"),
        log(col("c").cast("double")).as("y"),
        log(col("rank").cast("double")).as("x"))
    // NaN→NULL on the regr_* outputs: a single-token source has zero
    // x-variance, where Spark's aggregates yield NaN but DuckDB NULL
    def r4(c: org.apache.spark.sql.Column) =
      when(isnan(c), lit(null)).otherwise(round(c, 4))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
           regr_slope(col("y"), col("x")).as("s"),
           regr_intercept(col("y"), col("x")).as("i"),
           regr_r2(col("y"), col("x")).as("r"))
      .select(col("source"), col("n_terms"),
        r4(col("s")).as("zipf_slope"),
        r4(col("i")).as("zipf_intercept"),
        r4(col("r")).as("r2"))
      .orderBy(col("source"))
  }

  val q119Sql: String =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
      |r AS (SELECT source, ln(c::DOUBLE) AS y, ln(rank::DOUBLE) AS x
      |      FROM (SELECT source, c,
      |                   row_number() OVER (PARTITION BY source
      |                                      ORDER BY c DESC, tok) AS rank
      |            FROM c)
      |      WHERE rank <= 200)
      |SELECT source, count(*) AS n_terms,
      |       round(regr_slope(y, x), 4) AS zipf_slope,
      |       round(regr_intercept(y, x), 4) AS zipf_intercept,
      |       round(regr_r2(y, x), 4) AS r2
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q140: Good–Turing mass
  /** Good–Turing frequency-of-frequency statistics per source: how much
    * trigram probability mass sits on singletons (N₁/N — the GT estimate
    * of unseen-event mass) and doubletons, plus the frequency spectrum
    * head. The quantity LM smoothing and coverage estimation start from.
    * Trigram counts → count-of-count table (tiny) → exact integer
    * ratios; the only corpus-sized step is the trigram aggregation,
    * map-side combined like every token pass here. */
  def q140GoodTuring(s: SparkSession, dir: String): DataFrame = {
    // bind the token array to an attribute BEFORE shingling — passing the
    // raw split(...) into shingles3 re-evaluates the split per element_at
    // (O(doc_len²) per doc; measured 6× slower on this query)
    val tri = Tables.documents(s, dir)
      .select(col("source"), split(col("text"), " ").as("tk"))
      .select(col("source"),
        explode(graft.functions.TextHash.shingles3(col("tk"))).as("g"))
      .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
    tri.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("n_tok"), col("n_types"), col("n1"), col("n2"),
        round(col("n1").cast("double") / col("n_tok"), 4).as("gt_unseen_mass"),
        round(col("n1").cast("double") / col("n_types"), 4).as("singleton_frac"))
      .orderBy(col("source"))
  }

  val q140Sql: String = {
    import graft.functions.TextHash.shingles3Sql
    s"""WITH toks AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
       |tri AS (SELECT source, unnest(${shingles3Sql("tk")}) AS g FROM toks
       |        WHERE len(tk) >= 3),
       |c AS (SELECT source, g, count(*) AS c FROM tri GROUP BY 1, 2)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS n_types,
       |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / sum(c), 4)
       |         AS gt_unseen_mass,
       |       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
       |         AS singleton_frac
       |FROM c GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q150: quantile normalization
  /** Cross-source quantile normalization: each document's length score is
    * replaced by the CORPUS value at the same within-source quantile, so
    * sources whose raw distributions differ (one writes long docs, one
    * short) become comparable before mixing/thresholding — the alignment
    * step quality-gating across heterogeneous sources needs (a fixed raw
    * cutoff over-prunes the short-doc source; a per-source PERCENTILE
    * cutoff is exactly what this makes uniform). Mapping is all-integer:
    * within-source rank rs of ns maps to global rank ⌈rs·N/ns⌉, and the
    * normalized value is the corpus score at that rank — engine-exact,
    * no interpolation. Scale: BOTH ranks come from ONE
    * [[DistRank.withGroupRank]] pass (range-partitioned sort + broadcast
    * offsets — the per-group counter rides the same partition-local scan
    * as the global one, sources need not be contiguous) — never a
    * single-partition corpus window, and never a skewed per-source one;
    * ns is a dimension-sized broadcast, N the rank pass's free total;
    * the rank-index join is an integer equi-join off the one rank
    * checkpoint. */
  def q150QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    val DistRank.Ranked(rk0, totalCol) = DistRank.withGroupRank(
      d, Seq("source"), "rs", Seq(col("n_chars"), col("doc_id")), globalRankCol = Some("gi"))
    // THREE consumers read the ranked frame (self-join legs + ns agg):
    // a lazy localCheckpoint materializes it once inside the single final
    // action (entity-grain, far below the fact table) instead of
    // re-sorting the reused exchange per consumer; N rides as the
    // in-plan total column the rank pass now carries for free
    val rk = rk0.withColumnRenamed(totalCol, "N").localCheckpoint(false)
    val ranked = rk
      .join(broadcast(rk.groupBy(col("source")).agg(count(lit(1)).as("ns"))), Seq("source"))
    val glob = rk.select(col("gi").as("ti"), col("n_chars").as("norm_chars"))
    ranked
      .withColumn("ti", expr("(rs * N + ns - 1) DIV ns"))
      .join(glob, Seq("ti"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("norm_chars"))
      .orderBy(col("doc_id"))
  }

  val q150Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |s AS (SELECT doc_id, source, n_chars,
      |        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rs,
      |        count(*) OVER (PARTITION BY source) AS ns,
      |        count(*) OVER () AS N
      |      FROM d),
      |g AS (SELECT n_chars AS norm_chars,
      |             row_number() OVER (ORDER BY n_chars, doc_id) AS gi FROM d)
      |SELECT s.doc_id, s.source, s.n_chars, g.norm_chars
      |FROM s JOIN g ON (s.rs * s.N + s.ns - 1) // s.ns = g.gi
      |ORDER BY s.doc_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q111_entropy",      q111Entropy _,     Some(q111Sql)),
    ("q112_vocab_growth", q112VocabGrowth _, Some(q112Sql)),
    ("q113_pmi",          q113Pmi _,         Some(q113Sql)),
    ("q119_zipf_fit",     q119ZipfFit _,     Some(q119Sql)),
    ("q140_good_turing",  q140GoodTuring _,  Some(q140Sql)),
    ("q150_quantile_norm", q150QuantileNorm _, Some(q150Sql)),
  )
}

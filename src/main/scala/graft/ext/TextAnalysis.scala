package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextHash._

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2 C4):
  * language-ID heuristic, quality scoring, token statistics, document
  * fingerprinting.
  *
  * All per-document metrics use higher-order array functions (filter /
  * transform / aggregate) instead of explode-and-reaggregate, so they are
  * one codegen'd map stage with zero shuffles — the shape that scans
  * 100 TB of documents at parquet speed. Only the corpus-wide term
  * statistics (q34) explode, and those aggregate map-side first.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "an", "of", "and", "to", "in")
  private val stopSqlList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  // ---------------------------------------------------------------- C4: language ID
  /** Stopword-ratio language heuristic (n-gram-class heuristic over the
    * token stream). Pure map stage. */
  def q32LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nstop = size(filter(toks, t => t.isInCollection(stopwords)))
    val ratio = nstop.cast("double") / size(toks)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        when(ratio >= 0.03, lit("en")).otherwise(lit("other")).as("lang_pred"),
        round(ratio, 4).as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  val q32Sql: String =
    s"""SELECT doc_id, lang,
       |  CASE WHEN ratio >= 0.03 THEN 'en' ELSE 'other' END AS lang_pred,
       |  round(ratio, 4) AS stop_ratio
       |FROM (SELECT doc_id, lang,
       |        len(list_filter(string_split(text, ' '), t -> list_contains($stopSqlList, t)))::DOUBLE
       |          / len(string_split(text, ' ')) AS ratio
       |      FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- C4: quality scoring
  /** THE corpus quality definition, shared by the reporting query (q33)
    * and the curation gate (q65) so the gate can never filter on a
    * different metric than the one surfaced: rounded
    * 0.5·min(n_tok/200, 1) + 0.5·uniq_ratio over a `text` column. */
  def qualityCol: org.apache.spark.sql.Column = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    round(least(nTok.cast("double") / 200.0, lit(1.0)) * 0.5 + uniqRatio * 0.5, 4)
  }

  /** DuckDB twin of [[qualityCol]]. */
  val qualitySqlExpr: String =
    """round(least(len(string_split(text, ' '))::DOUBLE / 200.0, 1.0) * 0.5
      |            + len(list_distinct(string_split(text, ' ')))::DOUBLE
      |              / len(string_split(text, ' ')) * 0.5, 4)""".stripMargin

  /** Length / vocabulary-diversity quality score in [0,1]. Pure map stage. */
  def q33QualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val avgWordLen = (length(col("text")) - (nTok - 1)).cast("double") / nTok
    Tables.documents(s, dir)
      .select(col("doc_id"), nTok.as("n_tok"),
        round(avgWordLen, 4).as("avg_word_len"),
        round(uniqRatio, 4).as("uniq_ratio"),
        qualityCol.as("quality"))
      .orderBy(col("doc_id"))
  }

  val q33Sql: String =
    s"""SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
       |  round((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
       |        / len(string_split(text, ' ')), 4) AS avg_word_len,
       |  round(len(list_distinct(string_split(text, ' ')))::DOUBLE
       |        / len(string_split(text, ' ')), 4) AS uniq_ratio,
       |  $qualitySqlExpr AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- C4: corpus term stats
  /** Corpus-wide term frequencies, top 50. Explode → partial (map-side)
    * count → final count: the only shuffle carries one row per distinct
    * term per partition. */
  def q34TokenStats(s: SparkSession, dir: String): DataFrame =
    Toks(s, dir).select(col("doc_id"), col("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("docs"))
      .orderBy(col("n").desc, col("tok"))
      .limit(50)

  val q34Sql: String =
    """SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- C4: fingerprint
  /** Position-weighted polynomial fingerprint (rolling-hash family), all
    * integer arithmetic mod 1e9+7 so both engines agree bit-for-bit.
    * Computed entirely with higher-order functions — no explode. */
  def q35Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    // 31^(i mod 8) position weights, i 0-based (≡ DuckDB's 1-based (i-1) mod 8)
    // tokval is reduced mod 1000003 before the position weight so the
    // product stays far below int64 overflow (DuckDB errors on overflow
    // where Spark would silently wrap).
    val terms = transform(toks, (t, i) =>
      ((tokval(t) % 1000003L) * element_at(
        typedLit(Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)),
        (i % 8) + 1)) % FpM)
    val fp = aggregate(terms, lit(0L), (acc, x) => (acc + x) % FpM)
    Tables.documents(s, dir)
      .select(col("doc_id"), fp.as("fp"))
      .orderBy(col("doc_id"))
  }

  val q35Sql: String =
    s"""SELECT doc_id,
       |  (sum(((${tokvalSql("tok")} % 1000003) *
       |    (CASE (i - 1) % 8 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 WHEN 3 THEN 29791
       |     WHEN 4 THEN 923521 WHEN 5 THEN 28629151 WHEN 6 THEN 887503681 ELSE 27512614111 END)) % $FpM) % $FpM)::BIGINT AS fp
       |FROM (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
       |        unnest(string_split(text, ' ')) AS tok FROM documents) t
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- C4: BPE-ish regex tokenization
  /** Token counting under two tokenizers: whitespace (the q34 baseline)
    * and a BPE-ish regex that splits letter runs / digit runs / punctuation
    * clusters — the class-based pre-tokenization BPE vocabularies start
    * from. Pattern kept to the Java∩RE2 regex subset. Pure map stage. */
  private val bpePat = "[a-z]+|[0-9]+|[^a-z0-9 ]+"

  /** BPE-ish subword token counting: a deterministic regex tokenizer (word pieces + punctuation, GPT-2 pre-tokenizer shape) whose per-document counts feed token budgeting. */
  def q64BpeTokens(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val re = regexp_extract_all(col("text"), lit(bpePat), lit(0))
    Tables.documents(s, dir)
      .select(col("doc_id"), size(ws).as("n_ws"), size(re).as("n_re"))
      .withColumn("ratio", round(col("n_re").cast("double") / col("n_ws"), 4))
      .orderBy(col("doc_id"))
  }

  val q64Sql: String =
    s"""SELECT doc_id, len(string_split(text, ' ')) AS n_ws,
       |  len(regexp_extract_all(text, '$bpePat')) AS n_re,
       |  round(len(regexp_extract_all(text, '$bpePat'))::DOUBLE
       |        / len(string_split(text, ' ')), 4) AS ratio
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- C4: heavy hitters (sketch — scale path for q34)
  /** Corpus heavy hitters via the Misra-Gries sketch
    * ([[graft.functions.FreqSketch]]): k-bounded buffers per partition
    * instead of one shuffled row per distinct term. Sketch counts are
    * arrival/merge-order-dependent, so (like q39's HLL) the gated output
    * is the GUARANTEE, not the counts: standard MG with k=32 counters
    * must retain every item with true frequency > N/(k+1) = N/33
    * (mergeable-summaries bound, which the counter-wise merge in
    * [[graft.functions.FreqSketch]] preserves), so `all_captured` is
    * deterministically true — not probabilistic — iff the sketch honors
    * its contract. DuckDB computes the same exact `n_required` and
    * asserts capture, making the row hash-matchable. The exact leg is
    * the audit; production runs the sketch alone. */
  def q69HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val fi = graft.functions.FreqSketch.frequent_items(32)
    val toks = Toks(s, dir).select(col("tok"))
    val sketch = toks.agg(fi(col("tok")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("tok"), lit(1).as("in_sketch"))
    val total = toks.agg(count(lit(1)).as("total"))
    val required = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .join(broadcast(total))          // 1-row frame — broadcast, no collect
      .filter(col("n") * 33 > col("total"))
    required.join(broadcast(sketch), Seq("tok"), "left")
      .agg(count(lit(1)).as("n_required"), count(col("in_sketch")).as("n_captured"))
      .select(col("n_required"), col("n_captured"),
        (col("n_required") === col("n_captured")).as("all_captured"))
  }

  val q69Sql: String =
    """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |     tot AS (SELECT count(*) AS total FROM tk),
      |     req AS (SELECT tok FROM tk GROUP BY tok
      |             HAVING count(*) * 33 > (SELECT total FROM tot))
      |SELECT count(*) AS n_required, count(*) AS n_captured,
      |  true AS all_captured
      |FROM req""".stripMargin

  // ---------------------------------------------------------------- C4: CMS point-frequency (third mergeable sketch)
  /** Count-min-sketch point-frequency audit ([[graft.functions.CmsSketch]])
    * — completes the mergeable-sketch family (q39 HLL distinct, q69 MG
    * membership, here CMS frequency). The gate follows the same
    * guarantee-not-estimate pattern: for the exact top-10 tokens, emit
    * the exact count and a verdict that the sketch estimate obeys both
    * CMS bounds — `est ≥ exact` (counters only over-count; deterministic
    * always) and `est ≤ exact + 4N/w` (collision overshoot). The upper
    * bound is probabilistic in general (the oracle asserts `true`), so
    * the margin is 4× the expected per-row collision mass N/w and the
    * estimate takes the MIN over 4 independent rows — overshoot needs a
    * >4×-mean cell in every row at once. For a fixed dataset+seeds the
    * outcome is deterministic (CMS merge is commutative addition → the
    * sketch is partitioning-invariant), and it is verified green at
    * every shipped sf. DuckDB emits the same exact counts asserting the
    * verdict.
    * Scale: sketch state is d·w = 4·512 longs (16 KiB) per partial,
    * constant in corpus size — the shuffle ships one buffer per map task
    * where exact counting ships a row per distinct term. */
  def q181CmsFrequency(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsSketch
    val toks = Toks(s, dir).select(col("tok"))
    val sketch = toks.agg(CmsSketch.cms(col("tok")).as("sk"))
    val total = toks.agg(count(lit(1)).as("total"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(10)
    top.join(broadcast(sketch)).join(broadcast(total)) // both 1-row frames
      .withColumn("est", CmsSketch.cmsQuery(col("sk"), col("tok")))
      .select(col("tok"), col("n").as("exact_n"),
        (col("est") >= col("n") &&
          (col("est") - col("n")) * (CmsSketch.Width / 4) <= col("total"))
          .as("within_bound"))
      .orderBy(col("exact_n").desc, col("tok"))
  }

  val q181Sql: String =
    """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT tok, count(*) AS exact_n, true AS within_bound
      |FROM tk GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- C4: skip-gram co-occurrence
  /** Skip-gram (center, context) pair counts with window ±2 — the
    * extraction stage of word2vec/GloVe-style embedding training (q74's
    * adjacent-bigram counts are the window=1 special case used for BPE;
    * embedding co-occurrence needs the wider window). Pairs are
    * generated MAP-SIDE by zipping the token array against its offsets
    * (each position pairs with the next 1..2 tokens; counting unordered
    * pairs makes the ±window symmetric without double emit) — never a
    * positional self-join of the exploded table, whose equi-key is the
    * doc and therefore degenerates on long documents. The only shuffle
    * carries one row per distinct pair per partition (map-side combine).
    * Top-30 by (count, pair) is a TakeOrdered. */
  def q188Skipgram(s: SparkSession, dir: String): DataFrame = {
    val tk = col("tk")
    def offsetPairs(k: Int) =
      zip_with(slice(tk, lit(1), size(tk) - k), slice(tk, lit(k + 1), size(tk) - k),
        (a, b) => concat_ws(" ", least(a, b), greatest(a, b)))
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("tk"))
      .filter(size(tk) >= 2)
      .select(explode(concat(offsetPairs(1), offsetPairs(2))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
  }

  val q188Sql: String =
    """WITH ex AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
      |              unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT least(a.tok, b.tok) || ' ' || greatest(a.tok, b.tok) AS pair,
      |       count(*) AS n
      |FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 2
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- C4: BPE merge induction
  /** The core BPE *training* step: count adjacent token pairs across the
    * corpus and rank the top merge candidates (q64 is the tokenizer
    * *application* side; this is how its vocabulary is learned). Adjacent
    * pairs come from zipping the token array with its own tail — a pure
    * map stage; the only shuffle carries one row per distinct pair per
    * partition (map-side partial count). At 100 TB this is the per-merge
    * inner loop of distributed BPE training. */
  def q74BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val tk = col("tk")
    val pairs = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("tk"))
      .filter(size(tk) >= 2)
      .select(explode(zip_with(
        slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1),
        (a, b) => concat_ws(" ", a, b))).as("pair"))
    pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
  }

  val q74Sql: String =
    """WITH ex AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
      |              unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT a.tok || ' ' || b.tok AS pair, count(*) AS n
      |FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- C4: token-rarity scoring
  /** Corpus-relative rarity score per document: how unusual a document's
    * vocabulary is against corpus document frequencies — the
    * importance-weighting signal for rare-knowledge upsampling. Score is
    * n_tok·N / Σ df(tok): a single division of exact integers (harmonic
    * mean of df/N), so both engines agree bit-for-bit — no logs, which are
    * not bit-portable across engines. The df dictionary is
    * vocabulary-sized (≪ corpus), broadcast so the exploded token stream
    * never shuffles. */
  def q75TokenRarity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // tok feeds both the df dictionary and the per-occurrence join — the
    // shared Toks checkpoint serves both (at 100 TB that cache is a
    // parquet checkpoint table, never a spilled in-memory corpus).
    val tok = Toks(s, dir).select(col("doc_id"), col("tok"))
    locally {
      // corpus size is an O(1) scalar — one count job (parquet row-group
      // stats, no data pages) instead of a broadcast-subquery branch and
      // its own sequential AQE stage
      val nDocs = docs.count()
      // df via map-side per-document dedup (q58's dfreq pattern): one
      // tok-keyed aggregate; `tok.distinct()` here would shuffle the whole
      // exploded (doc, tok) stream once just to dedup, then shuffle again
      // for the count — two corpus-scale exchanges instead of one
      val dfreq = docs
        .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      tok.join(broadcast(dfreq), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("df")).as("sum_df"))
        .select(col("doc_id"), col("n_tok"),
          round(col("n_tok").cast("double") * lit(nDocs) / col("sum_df"), 4).as("rarity"))
        .orderBy(col("doc_id"))
    }
  }

  val q75Sql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |dfq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
      |agg AS (SELECT t.doc_id, count(*) AS n_tok, sum(d.df) AS sum_df
      |        FROM tok t JOIN dfq d USING (tok) GROUP BY t.doc_id)
      |SELECT doc_id, n_tok,
      |  round(n_tok::DOUBLE * (SELECT count(*) FROM documents) / sum_df, 4) AS rarity
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- C4: inverted index
  /** Inverted-index construction: the term dictionary with document
    * frequency and the head of each term's sorted posting list (what a
    * postings-dictionary page holds; full lists would be the payload of an
    * index shard write, truncated here so the result stays hashable).
    * Memory-bounded at any corpus size: the (term, doc) stream dedups
    * through a spillable hash aggregate (map-side partial dedup), the head
    * is selected by a row_number window (sort spills, no buffer grows with
    * df), and only the ≤8 head ids ever enter a collect_list — a stopword
    * posting list is never materialized whole. Heads are emitted
    * comma-joined (integer formatting is engine-portable, raw arrays are
    * not driver-hashable). */
  def q93InvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val post = Toks(s, dir).select(col("doc_id"), col("tok"))
      .distinct()
    val wHead = Window.partitionBy(col("tok")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("tok"))
    post
      .withColumn("df", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wHead))
      .filter(col("rn") <= 8)
      .groupBy(col("tok"), col("df"))
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings_head"))
      .select(col("tok"), col("df"), col("postings_head"))
      .orderBy(col("df").desc, col("tok"))
      .limit(100)
  }

  val q93Sql: String =
    """SELECT tok, count(DISTINCT doc_id) AS df,
      |  array_to_string(list_sort(list_distinct(list(doc_id)))[1:8], ',') AS postings_head
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |GROUP BY tok
      |ORDER BY df DESC, tok LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- C4: bigram LM head
  /** Bigram language-model head: per left token, the most frequent next
    * token and its conditional probability — the n-gram statistic behind
    * repetition/perplexity filters. Bigrams come from q74's tail-zip (one
    * compiled pass, no self-join); the per-prefix argmax is a lexicographic
    * struct max (q62's pattern — one aggregate, no window sort). The
    * probability is a rational of exact integers, so it is engine-exact. */
  def q94BigramLm(s: SparkSession, dir: String): DataFrame = {
    val tk = col("tk")
    val bi = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("tk"))
      .filter(size(tk) >= 2)
      .select(explode(zip_with(
        slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .groupBy(col("w1"))
      .agg(sum(col("c")).as("n_total"), max(struct(col("c"), col("w2"))).as("top"))
      .filter(col("n_total") >= 5)
      .select(col("w1"), col("n_total"),
        col("top.w2").as("top_w2"), col("top.c").as("top_c"),
        round(col("top.c").cast("double") / col("n_total"), 4).as("p_next"))
      .orderBy(col("n_total").desc, col("w1"))
      .limit(100)
  }

  val q94Sql: String =
    """WITH ex AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
      |              unnest(string_split(text, ' ')) AS tok FROM documents),
      |b AS (SELECT a.tok AS w1, b.tok AS w2
      |      FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |c AS (SELECT w1, w2, count(*) AS c FROM b GROUP BY 1, 2),
      |a AS (SELECT w1, sum(c)::BIGINT AS n_total,
      |        max(struct_pack(c := c, w2 := w2)) AS top
      |      FROM c GROUP BY w1 HAVING sum(c) >= 5)
      |SELECT w1, n_total, top.w2 AS top_w2, top.c::BIGINT AS top_c,
      |  round(top.c::DOUBLE / n_total, 4) AS p_next
      |FROM a ORDER BY n_total DESC, w1 LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- C4: source-mixture drift
  /** Distribution drift per source: the total-variation distance between
    * each source's language mix and the corpus-wide mix — the
    * mixture-monitoring signal that catches a crawl source whose
    * composition shifted (an ingest gate alerts when tv_dist moves).
    * TV = ½·Σ_l |n_sl/N_s − n_l/N| is evaluated as
    * Σ_l |n_sl·N − n_l·N_s| / (2·N_s·N): the numerator is an EXACT
    * integer sum (engine-portable regardless of aggregation order — the
    * reason this is TV and not KL, whose logs are not bit-portable), and
    * only the final division is floating. n·N stays below 2⁶³ up to
    * ~3e9 docs; past that, swap the numerator to DECIMAL. One full-data
    * pass collapses to (source, lang) cells; everything after is
    * dimension-sized (the grid cross-join is |sources|×|langs|). */
  def q104SourceDrift(s: SparkSession, dir: String): DataFrame = {
    // cell feeds four consumers (per-source, per-lang, corpus totals, the
    // grid join); it is dimension-sized, so materialize it eagerly rather
    // than re-running the corpus aggregate per consumer.
    val cell = Tables.documents(s, dir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("nsl"))
      .localCheckpoint(true)
    val bySrc = cell.groupBy(col("source")).agg(sum(col("nsl")).as("ns"))
    val byLang = cell.groupBy(col("lang")).agg(sum(col("nsl")).as("nl"))
    val total = cell.agg(sum(col("nsl")).as("nn"))
    bySrc.crossJoin(broadcast(byLang))            // full grid: absent langs count as 0
      .join(cell, Seq("source", "lang"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("source"), col("ns"), col("nn"))
      .agg(sum(abs(coalesce(col("nsl"), lit(0L)) * col("nn") - col("nl") * col("ns")))
        .as("num"))
      .select(col("source"), col("ns").as("n_docs"),
        round(col("num").cast("double") / (lit(2.0) * col("ns") * col("nn")), 6)
          .as("tv_dist"))
      .orderBy(col("source"))
  }

  val q104Sql: String =
    """WITH cell AS (SELECT source, lang, count(*) AS nsl FROM documents
      |              GROUP BY source, lang),
      |by_src AS (SELECT source, sum(nsl)::BIGINT AS ns FROM cell GROUP BY source),
      |by_lang AS (SELECT lang, sum(nsl)::BIGINT AS nl FROM cell GROUP BY lang),
      |tot AS (SELECT sum(nsl)::BIGINT AS nn FROM cell),
      |grid AS (SELECT s.source, s.ns, l.lang, l.nl, coalesce(c.nsl, 0) AS nsl, t.nn
      |         FROM by_src s CROSS JOIN by_lang l
      |         LEFT JOIN cell c ON c.source = s.source AND c.lang = l.lang
      |         CROSS JOIN tot t)
      |SELECT source, ns AS n_docs,
      |       round(sum(abs(nsl * nn - nl * ns))::DOUBLE / (2.0 * ns * nn), 6) AS tv_dist
      |FROM grid GROUP BY source, ns, nn ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q167: LM perplexity scoring
  /** CCNet-style language-model quality scoring: train the corpus bigram
    * LM (q94's counts) and score every document by its mean per-bigram
    * negative log-likelihood — the perplexity filter that CCNet/C4-class
    * pipelines use to rank crawl text against a reference LM. Reported
    * per source: mean and worst document NLL.
    *
    * Engine-exactness: each bigram's NLL is fixed to integer micro-nats
    * (round(−ln(c/np)·10⁴)) the moment it is computed, so every
    * downstream accumulation — per-doc sum, per-doc mean, per-source
    * mean — is EXACT integer arithmetic (half-up integer mean =
    * (2a+b) DIV 2b, the q134 pattern); no float-sum ordering anywhere.
    *
    * Scale design: one corpus pass explodes bigrams (tail-zip, no
    * self-join); the LM table is unique-bigram-sized (Zipf-bounded).
    * Scoring re-joins bigrams to the LM co-partitioned on (w1,w2) — both
    * sides shuffle once on the same key; everything after the per-doc
    * aggregate is source-cardinality. The bigram explode is
    * localCheckpoint'd once and feeds train + score (at 100 TB: the
    * pipeline's tokenize-stage checkpoint table, Toks precedent). */
  def q167LmScore(s: SparkSession, dir: String): DataFrame = {
    val tk = col("tk")
    val bi = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("tk"))
      .filter(size(tk) >= 2)
      .select(col("doc_id"), col("source"), explode(zip_with(
        slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("source"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .localCheckpoint(true)
    val cnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val pre = cnt.groupBy(col("w1")).agg(sum(col("c")).as("np"))
    val lm = cnt.join(pre, "w1")
      .withColumn("nll_e4",
        round(-log(col("c").cast("double") / col("np")) * 10000).cast("long"))
      .select(col("w1"), col("w2"), col("nll_e4"))
    bi.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("nll_e4")).as("se4"), count(lit(1)).as("nb"))
      .withColumn("doc_nll_e4", expr("(2 * se4 + nb) DIV (2 * nb)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("doc_nll_e4")).as("s2"),
           max(col("doc_nll_e4")).as("w4"))
      .select(col("source"), col("n_docs"),
        (expr("(2 * s2 + n_docs) DIV (2 * n_docs)") / 10000.0).as("avg_nll"),
        (col("w4") / 10000.0).as("worst_nll"))
      .orderBy(col("source"))
  }

  val q167Sql: String =
    """WITH ex AS (SELECT doc_id, source,
      |              generate_subscripts(string_split(text, ' '), 1) AS i,
      |              unnest(string_split(text, ' ')) AS tok FROM documents),
      |bg AS (SELECT a.doc_id, a.source, a.tok AS w1, b.tok AS w2
      |       FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |cn AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
      |pr AS (SELECT w1, sum(cnt)::BIGINT AS np FROM cn GROUP BY 1),
      |lm AS (SELECT cn.w1, cn.w2,
      |         CAST(round(-ln(cn.cnt::DOUBLE / pr.np) * 10000) AS BIGINT) AS nll_e4
      |       FROM cn JOIN pr USING (w1)),
      |d AS (SELECT doc_id, source, sum(nll_e4)::BIGINT AS se4,
      |             count(*)::BIGINT AS nb
      |      FROM bg JOIN lm USING (w1, w2) GROUP BY 1, 2),
      |d2 AS (SELECT source, (2 * se4 + nb) // (2 * nb) AS doc_nll_e4 FROM d)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |  ((2 * sum(doc_nll_e4)::BIGINT + count(*)) // (2 * count(*))) / 10000.0 AS avg_nll,
      |  max(doc_nll_e4) / 10000.0 AS worst_nll
      |FROM d2 GROUP BY source ORDER BY source""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q32_lang_id",       q32LangId _,       Some(q32Sql)),
    ("q167_lm_score",     q167LmScore _,     Some(q167Sql)),
    ("q33_quality_score", q33QualityScore _, Some(q33Sql)),
    ("q34_token_stats",   q34TokenStats _,   Some(q34Sql)),
    ("q35_fingerprint",   q35Fingerprint _,  Some(q35Sql)),
    ("q64_bpe_tokens",    q64BpeTokens _,    Some(q64Sql)),
    ("q69_heavy_hitters", q69HeavyHitters _, Some(q69Sql)),
    ("q181_cms_frequency", q181CmsFrequency _, Some(q181Sql)),
    ("q188_skipgram", q188Skipgram _, Some(q188Sql)),
    ("q74_bpe_merges",    q74BpeMerges _,    Some(q74Sql)),
    ("q75_token_rarity",  q75TokenRarity _,  Some(q75Sql)),
    ("q93_inverted_index", q93InvertedIndex _, Some(q93Sql)),
    ("q94_bigram_lm",      q94BigramLm _,      Some(q94Sql)),
    ("q104_source_drift",  q104SourceDrift _,  Some(q104Sql)),
  )
}

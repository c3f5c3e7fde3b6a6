package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture property tests for the q210/q211/q212 dedup family —
  * each test pins the operator's HEADLINE claim, not just its output
  * shape: SemDeDup keeps the farthest-from-centroid exemplar, the
  * symmetric-delete index is complete for edit distance 1 (including the
  * first-char typo that first-char blocking misses), and content-defined
  * chunk boundaries re-synchronize after an insertion that desyncs every
  * fixed-grid block. */
class DedupPropertySpec extends SparkSpec {

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = tmpDir("emb-prop")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q210: drops the closer-to-centroid member of each near-dup pair, seeds included") {
    // two cells (seed ids 0 and 100); near-dup chains in each
    val dir = embDir(Seq(
      (0L,   Seq(1f, 0f, 0f, 0f), 0),     // seed cell 0; cent_cos 1.0 → loses to both near-dups
      (1L,   Seq(0.9f, 0.1f, 0f, 0f), 0), // closer than id 2 → dropped
      (2L,   Seq(0.8f, 0.2f, 0f, 0f), 0), // farthest exemplar of the chain → kept
      (3L,   Seq(0f, 0f, 1f, 0f), 0),     // orthogonal: cos 0 to both centroids → tie → cell 0; no pair → kept
      (100L, Seq(0f, 1f, 0f, 0f), 1),     // seed cell 100; loses to its one near-dup
      (101L, Seq(0.1f, 0.9f, 0f, 0f), 1)))
    val got = Similarity.q210Semdedup(spark, dir)
      .select("vec_id", "cell", "dropped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set(
      (0L, 0L, true), (1L, 0L, true), (2L, 0L, false), (3L, 0L, false),
      (100L, 100L, true), (101L, 100L, false)))
  }

  test("q211: deletion-neighborhood index finds every d=1 pair brute force finds") {
    import spark.implicits._
    val dir = tmpDir("cust-prop")
    // base + one mutant per edit class, all on the 1-in-7 custkey slice;
    // "blphabet" is the first-char substitution that first-char blocking
    // (q73's scheme) provably misses
    val names = Seq("alphabet", "alphabex", "blphabet", "alphabt", "alphabetz", "zalphabet")
    names.zipWithIndex.map { case (n, i) => (i.toLong * 7, n) }
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = Dedup.q211SymspellJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // ground truth: all-pairs levenshtein (6 names — trivially exact)
    val nd = names.toDF("w")
    val exp = nd.as("a").crossJoin(nd.as("b"))
      .filter(col("a.w") < col("b.w") && levenshtein(col("a.w"), col("b.w")) === 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == exp)
    assert(got.contains(("alphabet", "blphabet")), "first-char typo must be caught")
  }

  test("q212: CDC boundaries re-synchronize after an insertion; fixed grid does not") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("join", "hash", "scan", "merge", "filter", "table")
    val a = Seq.fill(150)(words(rnd.nextInt(words.size))).mkString(" ")
    val b = a.substring(0, 100) + "Z" + a.substring(100) // one-char insert
    val dir = tmpDir("docs-cdc")
    Seq((1L, a, "en", "s", a.length), (2L, b, "en", "s", b.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = Dedup.q212CdcChunks(spark, dir).collect()(0)
    val nChunks = r.getLong(1); val nDistinct = r.getLong(2)
    val shared = nChunks - nDistinct
    // CDC: everything before the edit and everything after the ~one-window
    // resync point chunks identically → most chunks appear in both docs
    assert(shared >= 30, s"CDC shared chunks = $shared of $nChunks")
    // contrast: fixed 16-char blocks desync at the insert and never
    // recover — the shifted tail shares (almost) nothing
    val gridShared = {
      val ga = a.grouped(16).toSeq; val gb = b.grouped(16).toSeq
      val counts = ga.groupBy(identity).view.mapValues(_.size)
      gb.map(c => counts.getOrElse(c, 0)).count(_ > 0)
    }
    assert(gridShared < shared / 3,
      s"fixed grid shared $gridShared should be far below CDC's $shared")
  }

  test("q147 verify takes the certified sorted-hash path, and it matches the string kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("join", "hash", "scan", "merge", "filter", "table", "sort", "agg")
    def doc() = Seq.fill(40)(words(rnd.nextInt(words.size))).mkString(" ")
    val base = (0L until 20L).map(i => (i, doc()))
    // plant near-dups (1 word mutated) so the join has real output
    val dups = base.take(5).map { case (i, t) =>
      val w = t.split(" "); w(3) = "mutant"; (100L + i, w.mkString(" "))
    }
    val dir = tmpDir("docs-ssj")
    (base ++ dups).map { case (i, t) => (i, t, "en", "s", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val q = Dedup.q147PrefixSsjoin(spark, dir)
    // the FAST path must be planned on a collision-free corpus — a silent
    // regression to the per-pair string fallback would cost 10×+ at scale
    assert(q.queryExecution.executedPlan.toString.contains("jaccard_sorted_longs"),
      "q147 verify is not on the sorted-hash fast path")
    // and its verdicts must equal the string kernel's, pair for pair
    val fromHash = q.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val toks = (base ++ dups).toMap
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val ids = (base ++ dups).map(_._1)
    val brute = (for {
      a <- ids; b <- ids if a < b
      sa = sh(toks(a)); sb = sh(toks(b))
      u = (sa ++ sb).size if u > 0
      j = math.rint((sa & sb).size.toDouble / u * 10000) / 10000 if j >= 0.8
    } yield (a, b) -> j).toMap
    assert(fromHash == brute, s"hash-path pairs $fromHash != brute $brute")
  }
}

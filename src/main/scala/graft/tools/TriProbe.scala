package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component timing for the q182 triangle census: pair-table build,
  * degree table, and the three census formulations ALTERNATED in one
  * session (the only drift-proof comparison shape, bench/DRIFT_r7.md):
  *   - old-idcanon: the pre-round-8 id-canonical 3-way self-join
  *   - join-form:   degree-oriented wedge self-join (round 8)
  *   - adj-form:    degree-oriented adjacency-array expansion (round 9)
  *
  * Corpora:
  *   default             — supportedPairs over SPARK_GRAFT_SF_DIR
  *   SPARK_GRAFT_TRI_CORPUS=powerlaw — a synthetic hub-heavy graph
  *     (Zipf-ish degree tail), because the co-purchase replica corpus
  *     is hub-free (max deg ≈ 2× avg) and cannot exercise the O(√m)
  *     out-degree bound the orientation exists for. Deterministic:
  *     edge endpoints come from xxhash64 of the edge index, target
  *     sampling ∝ 1/rank (inverse-CDF via pow), then id-canonicalized
  *     and deduped — same (p1 < p2 distinct) shape as supportedPairs.
  */
object TriProbe {
  def powerlawPairs(spark: SparkSession, nodes: Int, edges: Long): DataFrame = {
    // Chung-Lu-style draw with rank weights ∝ r^(-1/2) via inverse-CDF
    // on a hash-uniform u in (0,1): r = ceil(u²·N). The top rank then
    // receives ~1/√N of all endpoint draws, i.e. max degree ≈ √m — a
    // hub two orders of magnitude over the average, exactly the regime
    // the degree-orientation bound exists for (heavier tails make the
    // id-canonical control blow up past probe scale; lighter ones make
    // the corpus hub-free like the replica). Deterministic: two
    // independent xxhash64 draws per edge index; self-loops dropped.
    val u1 = (pmod(xxhash64(col("id"), lit(1)), lit(1L << 40)).cast("double") + 0.5) / (1L << 40).toDouble
    val u2 = (pmod(xxhash64(col("id"), lit(2)), lit(1L << 40)).cast("double") + 0.5) / (1L << 40).toDouble
    def draw(u: org.apache.spark.sql.Column) =
      greatest(lit(1L), ceil(u * u * lit(nodes.toDouble)).cast("long"))
    spark.range(edges).toDF("id")
      .select(draw(u1).as("a"), draw(u2).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2"))
      .distinct()
      .localCheckpoint(true)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val corpus = sys.env.getOrElse("SPARK_GRAFT_TRI_CORPUS", "pairs")
    // peak single-task execution memory per timed window: the hub-guard
    // criterion — an unguarded wedge expansion shows a per-task peak that
    // GROWS with max degree (one task allocates the hub's O(outdeg²)
    // array); the chunked form must stay flat
    val peak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        ()
      }
    })
    def time(name: String)(f: => Long): Unit = {
      peak.set(0)
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      try org.apache.spark.sql.graftshim.Shim.flushListenerBus(spark.sparkContext)
      catch { case _: java.util.concurrent.TimeoutException => () }
      println(f"[tri] $name%-28s $sec%.2f s  rows=$n  taskpeak=${peak.get / 1048576} MB")
    }
    val up: DataFrame = corpus match {
      case "powerlaw" =>
        val nodes = sys.env.getOrElse("SPARK_GRAFT_TRI_NODES", "100000").toInt
        val edges = sys.env.getOrElse("SPARK_GRAFT_TRI_EDGES", "2000000").toLong
        val p = powerlawPairs(spark, nodes, edges)
        time("powerlaw(build)")(p.count())
        p
      case _ =>
        time("pairs(build)")(graft.ext.GraphOps.supportedPairs(spark, dir).count())
        time("pairs(warm)")(graft.ext.GraphOps.supportedPairs(spark, dir).count())
        graft.ext.GraphOps.supportedPairs(spark, dir).select(col("p1"), col("p2"))
    }
    // symmetric degrees off the pair table (corpus-agnostic)
    val deg = up.select(col("p1").as("src")).unionAll(up.select(col("p2").as("src")))
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    locally {
      val s = deg.agg(max(col("deg")).as("mx"), avg(col("deg")).as("av"),
        count(lit(1)).as("n")).head()
      println(f"[tri] corpus=$corpus nodes=${s.getLong(2)} maxdeg=${s.getLong(0)} avgdeg=${s.getDouble(1)}%.1f")
    }
    val o = graft.ext.GraphOps.orientedEdges(up, deg)
    def oldTri(): Long = {
      val e1 = up.select(col("p1").as("a"), col("p2").as("b"))
      val e2 = up.select(col("p1").as("b2"), col("p2").as("c2"))
      val e3 = up.select(col("p1").as("a3"), col("p2").as("c3"))
      e1.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
        .agg(count(lit(1)).as("n_triangles")).count()
    }
    // counts must agree before timings mean anything
    val cJoin = graft.ext.GraphOps.triCountJoinForm(o).head().getLong(0)
    val cAdj = graft.ext.GraphOps.triCountAdjForm(o).head().getLong(0)
    val cChk = graft.ext.GraphOps.triCountAdjChunked(o).head().getLong(0)
    require(cJoin == cAdj && cJoin == cChk,
      s"census mismatch: join=$cJoin adj=$cAdj adj-chunked=$cChk")
    println(s"[tri] n_triangles=$cJoin (join, adj, adj-chunked forms agree)")
    // the old id-canonical control is skipped on the powerlaw corpus: its
    // hub out-degree is the full hub degree, so its candidate set blows
    // up past probe scale there (that blow-up is WHY orientation exists)
    val withOld = corpus != "powerlaw" ||
      sys.env.get("SPARK_GRAFT_TRI_OLD").contains("on")
    // drain straggler task-end events from the (untimed) agreement runs
    // before the first timed window resets the peak counter — otherwise
    // window #1's taskpeak can absorb the adj census's allocations
    try org.apache.spark.sql.graftshim.Shim.flushListenerBus(spark.sparkContext)
    catch { case _: java.util.concurrent.TimeoutException => () }
    for (r <- 1 to 3) {
      if (withOld) time(s"old-idcanon#$r")(oldTri())
      time(s"join-form#$r")(graft.ext.GraphOps.triCountJoinForm(o).count())
      time(s"adj-form#$r")(graft.ext.GraphOps.triCountAdjForm(o).count())
      time(s"adj-chunked#$r")(graft.ext.GraphOps.triCountAdjChunked(o).count())
    }
    spark.stop()
  }
}

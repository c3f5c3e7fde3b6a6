package graft.util

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eviction contract of the shared-intermediate cache: pressure sweeps
  * drop idle entries, release their checkpoint storage, and leave
  * recently-used entries alone; consumers transparently rebuild. */
class SessionDirCacheSpec extends SparkSpec {

  private def checkpointed(tag: Int): DataFrame =
    spark.range(1000).toDF("id").withColumn("t", lit(tag)).localCheckpoint(true)

  test("sweep evicts idle entries, keeps recently-used ones, and rebuilds on miss") {
    val cache = new SessionDirCache[DataFrame](SessionDirCache.releaseDf)
    var builds = 0
    def get(dir: String): DataFrame = cache(spark, dir) { (_, _) =>
      builds += 1; checkpointed(builds)
    }
    get("/a"); get("/b")
    assert(builds == 2)
    SessionDirCache.tick()
    get("/b") // /b stays hot, /a goes idle
    SessionDirCache.tick()
    assert(cache.sweepIdle(1) == 1) // /a idle > 1 generation
    get("/b")
    assert(builds == 2, "hot entry must survive the sweep")
    get("/a")
    assert(builds == 3, "swept entry must rebuild via a fresh cache miss")
    // the rebuilt value is usable (its checkpoint was never freed)
    assert(get("/a").count() == 1000)
  }

  test("released checkpoint storage actually leaves the block manager") {
    val cache = new SessionDirCache[DataFrame](SessionDirCache.releaseDf)
    val df = cache(spark, "/big") { (_, _) => checkpointed(99) }
    assert(df.count() == 1000)
    // the cached plan's OWN rdd id — suites run in parallel in this JVM,
    // so global storage sums are not a stable signal
    val rddId = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.head
    def resident(): Boolean =
      spark.sparkContext.getRDDStorageInfo.exists(i => i.id == rddId && i.memSize > 0)
    assert(resident(), "localCheckpoint must occupy storage")
    // age it out and sweep
    SessionDirCache.tick(); SessionDirCache.tick()
    assert(cache.sweepIdle(1) == 1)
    // unpersist is async (blocking=false): poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while (resident() && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!resident(), "swept entry's blocks must leave the block manager")
  }

  test("a sweep cannot interleave with an in-flight apply") {
    // the round-9 advisory hazard: entry removed + checkpoint freed
    // between computeIfAbsent returning and the caller's first use. The
    // lock makes apply/sweep mutually exclusive, so a sweep issued while
    // an apply is mid-build must block until the apply completes — and
    // then sees the fresh generation stamp, which keep=0 still spares
    // (the stamp IS this generation, strictly newer than the cutoff).
    val cache = new SessionDirCache[DataFrame](SessionDirCache.releaseDf)
    val inBuild = new java.util.concurrent.CountDownLatch(1)
    val finishBuild = new java.util.concurrent.CountDownLatch(1)
    val applier = new Thread(() => {
      cache(spark, "/race") { (_, _) =>
        inBuild.countDown()
        finishBuild.await()
        checkpointed(7)
      }
      ()
    })
    applier.start()
    inBuild.await()
    // age the clock so a non-blocking sweep WOULD evict, then race it
    SessionDirCache.tick(); SessionDirCache.tick()
    val sweepResult = new java.util.concurrent.atomic.AtomicInteger(-1)
    val sweeper = new Thread(() => sweepResult.set(cache.sweepIdle(0)))
    sweeper.start()
    Thread.sleep(100)
    assert(sweepResult.get == -1, "sweep must block while an apply is in flight")
    finishBuild.countDown()
    applier.join(10000); sweeper.join(10000)
    assert(sweepResult.get == 0,
      "the blocked sweep must spare the entry the apply just stamped")
    var rebuilt = false
    val df = cache(spark, "/race") { (_, _) => rebuilt = true; checkpointed(8) }
    assert(!rebuilt && df.count() == 1000)
  }

  test("caches without a release hook are never swept") {
    val cache = new SessionDirCache[String]()
    var builds = 0
    def get(): String = cache(spark, "/p") { (_, _) => builds += 1; "bucketed-path" }
    get()
    (1 to 5).foreach(_ => SessionDirCache.tick())
    assert(cache.sweepIdle(1) == 0)
    get()
    assert(builds == 1, "a path-valued cache must survive every sweep")
  }
}

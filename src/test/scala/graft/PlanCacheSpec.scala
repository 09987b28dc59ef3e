package graft

import graft.llm.Dedup

/** Bound + eviction contract of [[BoundedPlanCache]] (VERDICT r07 #3) and
  * its wiring into `Dedup.tokenPairsFor`. The cache is a pure memoization
  * layer: eviction may only ever cost a plan rebuild, never change results
  * — so the properties to pin are (1) the size bound actually holds,
  * (2) eviction is least-recently-USED (the hot key survives a sweep),
  * (3) dead-session entries are purged, and (4) a hit shares the identical
  * DataFrame instance (the sharing that makes the cache worth having).
  */
class PlanCacheSpec extends SparkSpec {

  private def df(i: Int) = spark.range(i.toLong + 1L).toDF("v")

  test("LRU bound holds and evicts least-recently-used, not newest") {
    val aliveSet = scala.collection.mutable.Set[Int](1, 2, 3, 4, 5)
    val c = new BoundedPlanCache[Int](maxEntries = 3, alive = aliveSet.contains)

    val d1 = c.getOrElseUpdate(1)(df(1))
    c.getOrElseUpdate(2)(df(2))
    c.getOrElseUpdate(3)(df(3))
    assert(c.size === 3)

    // Hit on 1 marks it most-recently-used; inserting 4 must evict 2.
    assert(c.getOrElseUpdate(1)(fail("hit must not rebuild")) eq d1)
    c.getOrElseUpdate(4)(df(4))
    assert(c.size === 3)
    assert(c.contains(1) && c.contains(3) && c.contains(4))
    assert(!c.contains(2), "LRU eviction dropped the wrong entry")

    // Evicted key rebuilds (a fresh instance), bound still holds.
    val d2b = c.getOrElseUpdate(2)(df(2))
    assert(c.size === 3 && c.contains(2))
    assert(!(d2b eq d1))
  }

  test("entries whose session died are purged on next access") {
    val aliveSet = scala.collection.mutable.Set[Int](1, 2, 3)
    val c = new BoundedPlanCache[Int](maxEntries = 8, alive = aliveSet.contains)
    (1 to 3).foreach(i => c.getOrElseUpdate(i)(df(i)))
    assert(c.size === 3)
    aliveSet -= 2
    assert(c.size === 2)
    assert(c.contains(1) && !c.contains(2) && c.contains(3))
    // A re-request for the purged key rebuilds rather than serving stale.
    aliveSet += 2
    var rebuilt = false
    c.getOrElseUpdate(2) { rebuilt = true; df(2) }
    assert(rebuilt)
  }

  test("first insert wins a race: later builders share the first plan") {
    val c = new BoundedPlanCache[Int](maxEntries = 2, alive = _ => true)
    val first = c.getOrElseUpdate(7)(df(7))
    val second = c.getOrElseUpdate(7)(df(99))
    assert(second eq first)
  }

  test("concurrent racers on one key all receive the same instance and " +
    "never block each other's builds") {
    val c = new BoundedPlanCache[Int](maxEntries = 4, alive = _ => true)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
          def call() = {
            gate.await()
            c.getOrElseUpdate(42) {
              builds.incrementAndGet()
              Thread.sleep(30) // a slow build must not hold the cache lock
              df(42)
            }
          }
        })
      }
      gate.countDown()
      val dfs = results.map(_.get(20, java.util.concurrent.TimeUnit.SECONDS))
      // The thunk runs outside the lock, so several racers MAY build, but
      // every caller must end up sharing one instance (first insert wins)
      // and the cache must hold exactly one entry for the key.
      assert(dfs.forall(_ eq dfs.head), "racers diverged onto different instances")
      assert(c.size == 1)
      assert(builds.get() >= 1 && builds.get() <= 8)
      // A later hit returns the settled instance without rebuilding.
      val after = builds.get()
      assert(c.getOrElseUpdate(42)(fail("hit must not rebuild")) eq dfs.head)
      assert(builds.get() == after)
    } finally pool.shutdownNow()
  }

  test("tokenPairsFor stays within its bound across an sfDir sweep and " +
    "keeps sharing one plan per (session, sfDir)") {
    import spark.implicits._
    val bound = Dedup.tokenPairsCache.maxEntries
    val root = java.nio.file.Files.createTempDirectory("graft-plancache").toFile
    root.deleteOnExit()

    // A sweep over bound+4 distinct sfDirs, each with a readable (lazy —
    // materialize is non-eager, so no job runs) documents table.
    val dirs = (0 until bound + 4).map { i =>
      val d = s"${root.getAbsolutePath}/sf$i"
      Seq((i.toLong, s"alpha beta w$i", "en", "src0"),
        (1000L + i, s"alpha beta w$i", "en", "src0"))
        .toDF("doc_id", "text", "lang", "source")
        .write.parquet(s"$d/documents.parquet")
      d
    }
    dirs.foreach(d => Dedup.tokenPairsFor(spark, d))
    assert(Dedup.tokenPairsCache.size <= bound,
      s"tokenPairsCache grew past its bound $bound")

    // The hot key still shares: two requests for the most recent dir
    // return the identical DataFrame instance.
    val last = dirs.last
    assert(Dedup.tokenPairsFor(spark, last) eq Dedup.tokenPairsFor(spark, last))

    // Eviction is only a lost memoization: the swept-out FIRST dir still
    // computes the correct pair (its two docs share all tokens → sim 1.0),
    // proving no cross-sfDir plan leak through the eviction path.
    val revived = Dedup.tokenPairsFor(spark, dirs.head)
      .select("da", "db", "sim_raw").collect()
    assert(revived.length === 1)
    assert(revived.head.getLong(0) === 0L && revived.head.getLong(1) === 1000L)
    assert(revived.head.getDouble(2) === 1.0d)
  }
}

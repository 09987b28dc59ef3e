package graft

import org.apache.spark.sql.DataFrame

/** Bounded LRU cache for logical-plan DataFrames (VERDICT r07 #3).
  *
  * [[Tables]] and `Dedup.tokenPairsFor` memoize plans keyed by
  * (SparkSession, sfDir, …). An unbounded TrieMap is fine for the harness
  * (3 sfDirs, one session) but on a long-lived cluster session sweeping
  * many directories it grows without eviction AND strongly references
  * every SparkSession it ever saw, pinning stopped test sessions in the
  * JVM. Two mitigations, both here:
  *
  *  1. an LRU bound (`maxEntries`): inserting past the bound drops the
  *     least-recently-USED entry, so the hot working set (the sfDir the
  *     current queries sweep) always survives;
  *  2. dead-key purge: every access first drops entries whose `alive`
  *     predicate is false (callers pass "the key's SparkSession is not
  *     stopped"), so a closed session's plans are freed on the next
  *     cache touch rather than at JVM exit.
  *
  * A dropped entry is only a lost memoization — the next request rebuilds
  * the identical immutable plan — so eviction can never change results,
  * only (slightly) cost. The value thunk runs OUTSIDE the lock: for
  * tokenPairs it materializes a checkpoint (a real Spark job), and holding
  * a global lock across that would serialize Bench's concurrent pass. Two
  * racing builders may both compute; the FIRST insert wins so every later
  * consumer shares one plan (same first-writer-wins sharing the TrieMap
  * `getOrElseUpdate` gave).
  */
private[graft] final class BoundedPlanCache[K](
    val maxEntries: Int,
    alive: K => Boolean) {

  require(maxEntries > 0, "maxEntries must be positive")

  // accessOrder=true: iteration order is least-recently-accessed first.
  private val map = new java.util.LinkedHashMap[K, DataFrame](16, 0.75f, true)

  private def purgeDead(): Unit = {
    val it = map.keySet().iterator()
    while (it.hasNext) if (!alive(it.next())) it.remove()
  }

  def getOrElseUpdate(k: K)(mk: => DataFrame): DataFrame = {
    map.synchronized {
      purgeDead()
      val hit = map.get(k)
      if (hit != null) return hit
    }
    val built = mk // outside the lock: may run a Spark job (materialize)
    map.synchronized {
      val raced = map.get(k)
      if (raced != null) raced
      else {
        map.put(k, built)
        // LinkedHashMap's own removeEldestEntry hook needs subclassing;
        // an explicit trim keeps the class a plain field.
        while (map.size() > maxEntries) {
          val eldest = map.keySet().iterator()
          eldest.next(); eldest.remove()
        }
        built
      }
    }
  }

  def size: Int = map.synchronized { purgeDead(); map.size() }

  def contains(k: K): Boolean = map.synchronized { purgeDead(); map.containsKey(k) }
}

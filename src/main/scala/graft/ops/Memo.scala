package graft.ops

import scala.collection.concurrent.TrieMap

/** Race-safe memoization over a TrieMap whose builders carry side
  * effects (persist(), Spark jobs): `TrieMap.getOrElseUpdate` may run
  * two concurrent first-callers' builders and keep only one result,
  * leaking the loser's persisted blocks (ADVICE r5). Builds go through
  * a double-checked per-cache lock instead — the hot path (hit) stays
  * lock-free; only first-builds serialize, and those are multi-second
  * Spark jobs for which one coarse lock per cache is negligible.
  */
private[ops] object Memo {
  def memo[K, V](cache: TrieMap[K, V], key: K)(build: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None => cache.synchronized { cache.getOrElseUpdate(key, build) }
    }

  /** [[memo]] with a staleness check: the shipped drivers call
    * `spark.catalog.clearCache()` between queries, which unpersists a
    * memoized barriered table while the cache keeps returning the
    * now-cold handle — every later consumer silently recomputes the
    * full build per use instead of once. When `stale` reports the
    * cached value cold, drop it and rebuild (re-persisting). */
  def memoFresh[K, V](cache: TrieMap[K, V], key: K)(stale: V => Boolean)(
      build: => V): V = {
    val v = memo(cache, key)(build)
    if (!stale(v)) v
    else cache.synchronized {
      if (cache.get(key).exists(stale)) cache.remove(key)
      cache.getOrElseUpdate(key, build)
    }
  }

  /** Remove every entry of a session-keyed cache belonging to `owner`,
    * running `clean` (unpersist, close, …) on each removed value —
    * the per-cache primitive behind [[SessionCaches.evict]]. */
  def evictOwner[O <: AnyRef, K, V](
      cache: TrieMap[(O, K), V], owner: O)(clean: V => Unit): Unit =
    cache.keys.toSeq.filter(_._1 eq owner).foreach { k =>
      cache.remove(k).foreach(clean)
    }
}

/** Eviction for long-lived sessions (the soft half of ADVICE r5 #3):
  * the ops-level memo caches deliberately hold their (session, dir)
  * artifacts — persisted signature/frequency tables, built index
  * stores — for the life of the process, which is right for a sweep
  * but accumulates persisted blocks in a service that touches many
  * source dirs. `evict(spark)` drops every memoized artifact owned by
  * that session and unpersists its cached blocks; the next query
  * simply rebuilds. */
object SessionCaches {
  def evict(s: org.apache.spark.sql.SparkSession): Unit = {
    Dedup.evictSession(s)
    Curation.evictSession(s)
    TextOps.evictSession(s)
  }

  /** Per-query cleanup that PRESERVES the memoized shared artifacts.
    *
    * Bench used to call `spark.catalog.clearCache()` between sweep
    * queries, which unpersisted the memoized signature/pair/frequency
    * tables along with each query's transient barriers — so every later
    * consumer rebuilt the shared chain from scratch and the cross-query
    * sharing the memo layer exists for never happened under the bench
    * driver (VERDICT r6 #2/#3: q59b paid an 86.9s cold rebuild).
    *
    * This clears exactly what clearCache was there for — the finished
    * query's own materialization barriers, so block pressure never
    * bleeds into the next timing — while the memo-cached tables stay
    * warm. Every persist the ops modules issue goes through
    * `Dedup.barrier`, and the engine (`Executer`) unpersists its own
    * intermediates in `finally` blocks, so the barrier registry minus
    * the pinned set IS the transient set. */
  def clearTransient(s: org.apache.spark.sql.SparkSession): Unit = {
    val pinned = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[org.apache.spark.sql.DataFrame,
        java.lang.Boolean]())
    Dedup.pinnedArtifacts(s).foreach(pinned.add)
    Curation.pinnedArtifacts(s).foreach(pinned.add)
    TextOps.pinnedArtifacts(s).foreach(pinned.add)
    Dedup.clearBarriersExcept(s, pinned)
  }
}

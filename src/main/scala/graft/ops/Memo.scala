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
  }
}

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
}

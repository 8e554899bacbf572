package graft.ops

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r5: `TrieMap.getOrElseUpdate` can run two concurrent
  * first-callers' builders and keep only one result — fatal for
  * builders that persist() DataFrames (the loser's blocks leak).
  * [[Memo.memo]] must run the builder exactly once per key no matter
  * how many threads race the first call, and every caller must get the
  * same instance.
  */
class MemoSpec extends AnyFunSuite {

  test("racing first-callers share one build") {
    val cache = scala.collection.concurrent.TrieMap.empty[Int, AnyRef]
    val builds = new AtomicInteger(0)
    val threads = 16
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    try {
      val futs = (1 to threads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef = {
            start.await()
            Memo.memo(cache, 7) {
              builds.incrementAndGet()
              Thread.sleep(50) // widen the race window
              new Object
            }
          }
        })
      }
      start.countDown()
      val results = futs.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() === 1, "builder ran more than once under a race")
      assert(results.distinct.size === 1, "callers observed different instances")
    } finally pool.shutdownNow()
  }

  test("distinct keys build independently") {
    val cache = scala.collection.concurrent.TrieMap.empty[Int, Int]
    assert(Memo.memo(cache, 1)(10) === 10)
    assert(Memo.memo(cache, 2)(20) === 20)
    assert(Memo.memo(cache, 1)(99) === 10) // cached, builder not re-run
  }

  test("evictOwner removes only the owner's entries and cleans them") {
    val a = new Object; val b = new Object
    val cache = scala.collection.concurrent.TrieMap.empty[(Object, String), String]
    cache.put((a, "x"), "ax"); cache.put((a, "y"), "ay"); cache.put((b, "x"), "bx")
    val cleaned = scala.collection.mutable.Set.empty[String]
    Memo.evictOwner(cache, a)(cleaned += _)
    assert(cleaned === Set("ax", "ay"))
    assert(cache.keySet === Set((b, "x")))
  }

  test("SessionCaches.evict unpersists and forces a rebuild") {
    val spark = graft.TestSpark.spark
    val (sh1, _) = Curation.shingleFreq3(spark, "/root/testdata/sf0.001")
    assert(Curation.shingleFreq3(spark, "/root/testdata/sf0.001")._1 eq sh1,
      "second call must hit the memo")
    assert(sh1.storageLevel.useMemory, "memoized table should be persisted")
    SessionCaches.evict(spark)
    assert(sh1.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "evict must unpersist the cached blocks")
    val (sh2, _) = Curation.shingleFreq3(spark, "/root/testdata/sf0.001")
    assert(!(sh2 eq sh1), "evicted entry must rebuild")
  }
}

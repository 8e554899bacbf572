package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Phases, SessionCaches}

/** Pins the round-7 cache-lifecycle contract the bench driver depends
  * on: [[SessionCaches.clearTransient]] releases each query's own
  * barriers but KEEPS the memoized shared artifacts warm (so the
  * cross-query sharing actually happens under a driver that cleans
  * between queries), while [[SessionCaches.evict]] drops everything
  * (so a long-lived service can reclaim the memory). Observed through
  * the [[Phases]] build lines: a shared table that survived the clear
  * must NOT emit a second build line on its next use. */
class ClearTransientSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("clearTransient keeps memoized shared tables; evict drops them") {
    val builds = collection.mutable.ListBuffer[String]()
    Phases.enable(line => builds.synchronized { builds += line })
    try {
      // Start from a clean slate: other suites may share the session.
      SessionCaches.evict(spark)
      builds.clear()

      // First consumer builds the shared signature tables.
      SparkEntry.queries("q26_minhash_signatures")(spark, dir).count()
      assert(builds.exists(_.contains("sig_tables")),
        s"expected a sig_tables build line, got: $builds")

      // The per-query cleanup must NOT cost the next consumer a rebuild.
      SessionCaches.clearTransient(spark)
      builds.clear()
      SparkEntry.queries("q26_minhash_signatures")(spark, dir).count()
      assert(!builds.exists(_.contains("sig_tables")),
        s"clearTransient must keep the memoized tables warm, got: $builds")

      // Same for a second shared artifact downstream of the first.
      SparkEntry.queries("q27_lsh_candidate_pairs")(spark, dir).count()
      SessionCaches.clearTransient(spark)
      builds.clear()
      SparkEntry.queries("q27_lsh_candidate_pairs")(spark, dir).count()
      assert(!builds.exists(_.contains("lsh_pairs")),
        s"clearTransient must keep the pair table warm, got: $builds")

      // Full eviction DOES force the rebuild (and is how a service
      // reclaims the persisted blocks).
      SessionCaches.evict(spark)
      builds.clear()
      SparkEntry.queries("q26_minhash_signatures")(spark, dir).count()
      assert(builds.exists(_.contains("sig_tables")),
        s"evict must drop the memoized tables, got: $builds")
    } finally Phases.disable()
  }
}

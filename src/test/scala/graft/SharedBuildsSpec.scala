package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SharedBuilds

/** The shared-build registry is bench-scheduling METADATA maintained by
  * hand (which stores feed which sweep queries, and in what prereq
  * order) — exactly the kind of list that silently rots when a query is
  * renamed or a new consumer of a memoized table is added without a
  * registry edit (round 9 found q96 consuming freq3 unlisted, which
  * re-attributed the table's one-time build into q96's sweep timing).
  * Pin what is mechanically checkable. */
class SharedBuildsSpec extends AnyFunSuite {

  test("every registered consumer is a real SparkEntry query") {
    val qs = SparkEntry.queries.keySet
    for (b <- SharedBuilds.all; q <- b.queries)
      assert(qs.contains(q), s"build '${b.name}' lists unknown query '$q'")
  }

  test("build names are unique and every prereq resolves") {
    val names = SharedBuilds.all.map(_.name)
    assert(names.distinct == names)
    for (b <- SharedBuilds.all; p <- b.prereqs)
      assert(SharedBuilds.byName.contains(p),
        s"build '${b.name}' prereq '$p' is not registered")
  }

  test("depsOf terminates for every query and orders prereqs before " +
      "their dependents (the marginal-attribution invariant)") {
    for (q <- SparkEntry.queries.keySet) {
      val deps = SharedBuilds.depsOf(q)
      deps.zipWithIndex.foreach { case (b, i) =>
        b.prereqs.foreach { p =>
          assert(deps.take(i).exists(_.name == p),
            s"depsOf($q): '${b.name}' appears before its prereq '$p'")
        }
      }
    }
  }

  test("no query triggers a shared build it is not registered as " +
      "consuming (the q96/freq3 rot mode, ADVICE r9)") {
    // The OTHER direction of the first test: the registry's consumer
    // lists must be COMPLETE, not just valid. Method: run every query
    // at sf0.001 in an order that puts queries claiming NO builds
    // first — if such a query flips any registered build to isBuilt,
    // it is an unregistered consumer (when it ran, no listed consumer
    // could have built the store yet). Queries WITH registered deps
    // then run after, asserting their triggers ⊆ depsOf. Within-group
    // order is name-sorted, so a violation is attributed to the first
    // (deterministic) query that trips it. Caveat (documented, not
    // checkable here): builds memoize per PROCESS, so a store another
    // suite already built for this dir is invisible to this test —
    // the sf0.001 dir is used by few suites, and first-trigger
    // attribution is exactly the property the bench's cost accounting
    // needs.
    implicit lazy val spark: org.apache.spark.sql.SparkSession =
      TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    def builtNow(): Set[String] =
      SharedBuilds.all.filter(_.isBuilt(spark, dir)).map(_.name).toSet
    val (withDeps, noDeps) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition { case (n, _) => SharedBuilds.depsOf(n).nonEmpty }
    for ((name, fn) <- noDeps ++ withDeps) {
      val before = builtNow()
      // Result content is irrelevant here (the oracle gate owns it);
      // a query that cannot run at sf0.001 still must not leave an
      // unregistered build behind, which `finally`-style accounting
      // below catches either way.
      try fn(spark, dir).count()
      catch { case _: Throwable => () }
      val triggered = builtNow() -- before
      val allowed = SharedBuilds.depsOf(name).map(_.name).toSet
      val unregistered = triggered -- allowed
      assert(unregistered.isEmpty,
        s"query '$name' triggered unregistered shared builds: " +
          s"${unregistered.toSeq.sorted.mkString(", ")} — add it to their " +
          "consumer lists in SharedBuilds")
    }
  }

  test("the maintained-index update family names in Bench exist") {
    // Mirrors Bench.updateFamily — a rename there must fail loudly here,
    // not silently demote the family out of its priority slot.
    val family = Set(
      "q29_minhash_index_update", "q37_ivf_cell_index_update",
      "q41_mr_index_update", "q41b_mr_time_travel",
      "q59b_cluster_index_update", "q59c_recluster_refresh",
      "q64_winnow_index_update", "q77_shingle_freq_index_update",
      "q78_decontaminate_index_update", "q89_length_hist_index_update",
      "q89b_hist_drift", "q91_ivf_centroid_index_update",
      "q97_simhash_index_update")
    val qs = SparkEntry.queries.keySet
    family.foreach(q => assert(qs.contains(q), s"unknown family query $q"))
  }

  test("every disk-cached build carries its store-shape extra, and the " +
      "planner's probe rejects a stale-shape entry a bare tag probe " +
      "would accept") {
    // The extra is what keeps Bench's admission est honest: probing
    // isCached(tag) without it saw a pre-layout-change entry as a 2s
    // copy-cost hit while restore() then rejected its _GRAFT_EXTRA into
    // an unplanned cold build (review r15).
    SharedBuilds.all.filter(_.cacheTag.isDefined).foreach { b =>
      assert(b.cacheExtra.nonEmpty,
        s"build ${b.name} has a cacheTag but no cacheExtra — the " +
          "planner would probe it shapeless")
      assert(b.cacheExtra.contains("fanIn="),
        s"build ${b.name}: extra should fold the layout config")
    }
    // The probe semantics the fix relies on, demonstrated on a synthetic
    // entry: saved under one shape, probed under another.
    val was = graft.ops.StoreCache.isEnabled
    graft.ops.StoreCache.enable()
    try {
      val sf = TestTmp.dir("graft-sb-extra-sf")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sf, "t.parquet"), Array[Byte](5))
      val store = TestTmp.dir("graft-sb-extra-store")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(store, "data"), Array[Byte](1))
      graft.ops.StoreCache.save("sb-extra", sf, store, 0L,
        extra = "task:fanIn=64:finalParts=16:driverDirtyLimit=512")
      assert(graft.ops.StoreCache.isCached("sb-extra", sf),
        "the shapeless probe accepts the stale entry — exactly why " +
          "the planner must not use it")
      assert(!graft.ops.StoreCache.isCached("sb-extra", sf,
        extra = "task:fanIn=16:finalParts=8:driverDirtyLimit=512"),
        "the shaped probe must reject an entry saved under another layout")
    } finally if (!was) graft.ops.StoreCache.disable()
  }
}

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
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Pointer-jumping connected components (VERDICT r4 #5): convergence
  * must be O(log diameter), not O(diameter) — the r4 min-label
  * propagation threw on any component with diameter > 64, which a
  * 100 TB near-dup graph with one long chain component will have. */
class ConnectedComponentsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("a 200-node chain converges within 20 rounds to one component") {
    // Diameter 199: the pre-doubling algorithm provably cannot finish
    // inside 20 rounds (label propagation moves the min one hop per
    // round), so passing with maxIters=20 pins the log-d behavior.
    val ids = (0 until 200).map(i => f"n$i%03d")
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("id_a", "id_b")
    // driverEdgeLimit = 0: this spec pins the DISTRIBUTED algorithm's
    // convergence; the driver-local union-find path is pinned below.
    val labels = Dedup.connectedComponents(spark, edges, maxIters = 20,
        driverEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(labels.length == 200)
    assert(labels.forall(_._2 == "n000"))
  }

  test("random graph matches a driver-side union-find") {
    val rnd = new scala.util.Random(7)
    val n = 120
    val ids = (0 until n).map(i => f"v$i%03d")
    val edgeSeq = (0 until 150).map { _ =>
      (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
    }.filter(e => e._1 != e._2).distinct
    // Reference: classic union-find over the same edges.
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for ((a, b) <- edgeSeq) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val touched = edgeSeq.flatMap(e => Seq(e._1, e._2)).toSet
    val expect = touched.map { id =>
      // Component label = min id in the component.
      val members = touched.filter(o => find(o) == find(id))
      id -> members.min
    }.toMap
    val got = Dedup.connectedComponents(spark, edgeSeq.toDF("id_a", "id_b"),
        driverEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expect)

    // The driver-local fast path (bounded edge sets skip iterative
    // label propagation entirely, round 6) must agree exactly with the
    // distributed result on the same graph...
    val local = Dedup.connectedComponents(spark, edgeSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local == expect)

    // ...and for LONG ids must label by NUMERIC min, not string order
    // (string order would call "10" < "9").
    val longEdges = Seq((9L, 10L), (10L, 11L)).toDF("id_a", "id_b")
    val longLabels = Dedup.connectedComponents(spark, longEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(longLabels === Map(9L -> 9L, 10L -> 9L, 11L -> 9L))
  }
}

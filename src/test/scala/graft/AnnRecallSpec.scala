package graft

import org.scalatest.funsuite.AnyFunSuite

/** q73's structural guarantees (its VALUES are oracle-checked): the
  * multi-probe candidate pool is a superset of probe-1's, and top-k
  * membership against the exact ranking is monotone in the candidate
  * pool — so multi-probe recall can never be lower. Pinning this
  * catches a broken probe expansion even on data where both recalls
  * happen to be high. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("multi-probe recall dominates probe-1 recall, all recalls within [0,1]") {
    val rows = SparkEntry.queries("q73_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 8, s"expected 8 query points, got ${rows.length}")
    for (r <- rows) {
      val p1 = r.getAs[Double]("probe1_recall")
      val mp = r.getAs[Double]("multiprobe_recall")
      assert(p1 >= 0.0 && mp <= 1.0, s"recall out of range: $r")
      assert(mp >= p1, s"multi-probe recall below probe-1 for query ${r.get(0)}: $r")
    }
  }
}

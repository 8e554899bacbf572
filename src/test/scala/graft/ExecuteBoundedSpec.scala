package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}
import graft.ops.Dedup
import graft.ops.Dedup.ClusterRow

/** Pins both legs of [[Dedup.executeBounded]] — the bounded-collect
  * shim in front of `Executer.execute` for the q59b/q59c batches: a
  * batch that fits the driver limit takes the LocalRelation fast path
  * (one limit-probe job, then a driver-pruned update); a batch past
  * the limit must fall back to the distributed Dataset execute with
  * IDENTICAL results — never an unbounded driver materialization
  * (code-review r7). */
class ExecuteBoundedSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def freshStore(rows: Seq[ClusterRow]): Executer[ClusterRow, ClusterRow] = {
    val ex = new Executer(Dedup.NearDupClusterIndex,
      TestTmp.dir("graft-bounded"), ExecuterConfig(fanIn = 8, finalParts = 4))
    ex.execute(spark.createDataset(rows))
    ex
  }

  test("small batches go local, oversize batches stay distributed — same result") {
    val base = (1L to 50L).map(i => ClusterRow(i, i))

    // Small: well under MaxLocalBatch — local fast path.
    val exSmall = freshStore(base)
    Dedup.executeBounded(spark, exSmall,
      spark.createDataset(base.take(10).map(r => r.copy(cluster = 999L))),
      "spec", "probe")
    assert(exSmall.lastStats.exists(s => s.mode.startsWith("incremental") ||
      s.mode == "append"))

    // Oversize: MaxLocalBatch + 10 updated rows — must run the
    // distributed path (batch > driver limit) and still apply exactly.
    val big = (1L to (Dedup.MaxLocalBatch + 10).toLong)
      .map(i => ClusterRow(i, i))
    val exBig = freshStore(big)
    Dedup.executeBounded(spark, exBig,
      spark.createDataset(big.map(r => r.copy(cluster = 7L))),
      "spec", "probe")
    val got = exBig.queryAll().select($"doc_id", $"cluster")
      .as[(Long, Long)].collect()
    assert(got.length == big.length)
    assert(got.forall(_._2 == 7L),
      "every row of the oversize batch must have been applied")
  }
}

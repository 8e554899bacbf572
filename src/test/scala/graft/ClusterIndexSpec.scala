package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}
import graft.ops.Dedup.{ClusterRow, NearDupClusterIndex}

/** The near-dup cluster table as engine-maintained state (VERDICT r5
  * #2): per-doc assignment rows live in an Executer store; a new ingest
  * batch appends its assignments, a RE-assignment (the periodic
  * recluster landing a new verdict for an existing doc) replaces that
  * doc's row through delete-and-invalidate, and untouched docs' rows
  * are untouched state. q59b proves incremental ≡ batch against the
  * DuckDB oracle at sf0.01; this spec pins the row-replacement
  * semantics the oracle's insert-only ingest cannot reach.
  */
class ClusterIndexSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def table(ex: Executer[ClusterRow, ClusterRow]): Map[Long, Long] =
    ex.queryAll().select("doc_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("ingest appends, reassignment replaces, the rest is untouched") {
    val store = TestTmp.dir("graft-clusterspec")
    val ex = new Executer(NearDupClusterIndex, store,
      ExecuterConfig(fanIn = 4, finalParts = 2))

    // Base build: docs 1-3 cluster together under min-id 1; 4-6 are
    // singletons (their own cluster) — the q59 contract.
    val base = Seq(ClusterRow(1, 1), ClusterRow(2, 1), ClusterRow(3, 1),
      ClusterRow(4, 4), ClusterRow(5, 5), ClusterRow(6, 6))
    ex.execute(spark.createDataset(base))
    assert(table(ex) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 6L))

    // New-batch ingest: doc 7 joins cluster 1, doc 8 is a singleton.
    ex.execute(spark.createDataset(Seq(ClusterRow(7, 1), ClusterRow(8, 8))))
    assert(table(ex) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 6L, 7L -> 1L, 8L -> 8L))

    // Recluster verdict: doc 5 merges into cluster 4 — its OWN row is
    // replaced (delete-and-invalidate keyed by documentId), no other
    // row changes.
    ex.execute(spark.createDataset(Seq(ClusterRow(5, 4))))
    assert(table(ex) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 1L, 8L -> 8L))

    // Point query prunes to one reduce key.
    assert(ex.query("5").collect().toSeq === Seq(ClusterRow(5, 4)))

    // Persistence: a fresh Executer over the same store sees the
    // maintained state without any recompute.
    val ex2 = new Executer(NearDupClusterIndex, store,
      ExecuterConfig(fanIn = 4, finalParts = 2))
    assert(table(ex2) === table(ex))
  }

  test("streamed ingest maintains the cluster index per micro-batch") {
    // The production ingestion topology for the round-6 cluster store:
    // assignment batches arrive on a stream; every micro-batch is one
    // engine update against the maintained table (never a recompute),
    // and a later batch's re-assignment replaces the earlier row
    // through the same delete-and-invalidate path.
    val in = TestTmp.dir("graft-clstream-in")
    val store = TestTmp.dir("graft-clstream-store")
    val ckpt = TestTmp.dir("graft-clstream-ckpt")
    val sx = new graft.streaming.StreamingExecuter(
      NearDupClusterIndex, store,
      ExecuterConfig(fanIn = 4, finalParts = 2))
    def drain(): Unit = sx.attach(
      spark.readStream.schema("doc_id LONG, cluster LONG")
        .parquet(in).as[ClusterRow], ckpt).awaitTermination()

    spark.createDataset(Seq(ClusterRow(1, 1), ClusterRow(2, 1),
      ClusterRow(3, 3))).write.mode("append").parquet(in)
    drain()
    assert(table(sx.executer) === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))

    spark.createDataset(Seq(ClusterRow(4, 1), ClusterRow(3, 1)))
      .write.mode("append").parquet(in)
    drain()
    assert(table(sx.executer) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}

package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}

/** Randomized multi-batch soak: a long sequence of mixed batches
  * (inserts, updates, re-submissions, key deletes) driven through BOTH
  * maintenance paths (tiny driver-pruned batches and forced-distributed
  * batches), with the index compared to an in-memory model after every
  * batch. This is the IVM contract under realistic churn — any state
  * corruption (stale retained rows, missed invalidation, botched
  * partition swap) surfaces as a model divergence at the batch where it
  * happened.
  */
class SoakSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val states = Vector("CA", "TX", "WA", "NV", "OR")

  test("30 random mixed batches: index ≡ model after every batch") {
    val rnd = new Random(20260812L)
    val store = TestTmp.dir("graft-soak")
    // Small fanIn stresses sibling inclusion; tiny driverDirtyLimit on
    // odd batches forces the distributed path to interleave with the
    // driver-pruned one on the SAME store.
    val exSmall = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val exDist = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 4, finalParts = 2, driverDirtyLimit = 0))

    val model = collection.mutable.Map[String, String]() // id -> state
    var nextId = 0

    for (batch <- 1 to 30) {
      val ex = if (batch % 3 == 0) exDist else exSmall
      val op = rnd.nextInt(10)
      if (op < 6 || model.isEmpty) {
        // Mixed insert/update batch of 1..20 docs.
        val n = 1 + rnd.nextInt(20)
        val docs = (1 to n).map { _ =>
          val id =
            if (model.nonEmpty && rnd.nextBoolean()) {
              val keys = model.keys.toVector
              keys(rnd.nextInt(keys.size)) // update an existing doc
            } else { nextId += 1; s"doc-$nextId" } // fresh insert
          Person(id, states(rnd.nextInt(states.size)))
        }
        // Last occurrence wins within a batch, matching update semantics.
        val effective = docs.groupBy(_.id).map(_._2.last).toSeq
        effective.foreach(p => model(p.id) = p.state)
        ex.execute(spark.createDataset(effective))
      } else {
        // Whole-key delete.
        val present = model.values.toSet.toVector
        val key = present(rnd.nextInt(present.size))
        model.filterInPlace((_, st) => st != key)
        ex.delete(key)
      }

      val got = ex.queryAll().collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      val want = model.values.groupBy(identity).map { case (s, xs) => (s, xs.size.toLong) }
      assert(got == want, s"divergence after batch $batch (mode=${ex.lastStats.map(_.mode)})")
    }

    // After the churn: compact() folds tombstones and consolidates both
    // state tables; file counts must come back to O(#partitions) and the
    // index must still match the model (VERDICT r2 #5's soak criterion).
    exSmall.compact(maxFilesPerPartition = 1)
    def dataFiles(sub: String): Seq[(String, Int)] = {
      val root = new java.io.File(s"$store/$sub")
      def dirs(f: java.io.File): Iterator[java.io.File] =
        if (!f.isDirectory) Iterator.empty
        else Iterator(f) ++ f.listFiles().iterator.flatMap(dirs)
      dirs(root).filter(_.listFiles().exists(_.getName.endsWith(".parquet")))
        .map(d => (d.getPath.stripPrefix(store),
          d.listFiles().count(_.getName.endsWith(".parquet")))).toSeq
    }
    for ((dir, n) <- dataFiles("map_results") ++ dataFiles("reduce_tree"))
      assert(n <= 1, s"$dir still fragmented after compact(): $n files")
    assert(!new java.io.File(s"$store/tombstones.bin").exists())
    assert(!new java.io.File(s"$store/tombstones").exists())
    val got = exSmall.queryAll().collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == model.values.groupBy(identity)
      .map { case (s, xs) => (s, xs.size.toLong) })
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}

/** Forces every maintenance batch down the DISTRIBUTED path
  * (driverDirtyLimit = 0: no driver-side pruning, WAL written as
  * parquet, invalidation and re-reduce via joins) and asserts the
  * incremental result still equals a from-scratch batch build — the
  * same contract the driver-pruned path proves in ExecuterSpec. This is
  * the path a genuinely large update batch takes at scale, so it must
  * not rot while the small-batch path gets all the bench attention.
  */
class DistributedPathSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("distributed path: incremental update ≡ batch rebuild") {
    val people = (1 to 300).map(i =>
      Person(s"p-$i", if (i % 3 == 0) "CA" else if (i % 3 == 1) "TX" else "WA"))
    val moved = people.take(40).map(p => p.copy(state = "NV"))
    val finalState = moved ++ people.drop(40)

    // Incremental: build, then update 40 docs — all through the
    // distributed join path.
    val store = TestTmp.dir("graft-dist")
    val cfg = ExecuterConfig(fanIn = 8, finalParts = 4, driverDirtyLimit = 0)
    val ex = new Executer(PeopleCountByState, store, cfg)
    ex.execute(spark.createDataset(people))
    ex.execute(spark.createDataset(moved))
    assert(ex.lastStats.exists(_.mode == "incremental-distributed"))

    // Batch oracle: one fresh build over the post-update document state.
    val store2 = TestTmp.dir("graft-dist2")
    val ex2 = new Executer(PeopleCountByState, store2, cfg)
    ex2.execute(spark.createDataset(finalState))

    assert(ex.queryAll().collect().toSet == ex2.queryAll().collect().toSet)
    assert(ex.isClean)
  }

  test("distributed FIRST build rejects intra-batch duplicate ids (ADVICE r6)") {
    // The update path detects dups in its ids-probe, but the initial
    // build used to skip the probe entirely — two versions of one doc
    // would both land under the same seq and double-count forever.
    val store = TestTmp.dir("graft-dist-dup")
    val cfg = ExecuterConfig(fanIn = 8, finalParts = 4, driverDirtyLimit = 0)
    val ex = new Executer(PeopleCountByState, store, cfg)
    val batch = (1 to 50).map(i => Person(s"p-$i", "CA")) :+ Person("p-7", "TX")
    intercept[IllegalArgumentException] {
      ex.execute(spark.createDataset(batch).repartition(4))
    }
    // Case-insensitive ids collide on the build path too.
    intercept[IllegalArgumentException] {
      ex.execute(spark.createDataset(
        Seq(Person("x", "CA"), Person("X", "TX"))).repartition(2))
    }
    // A clean batch then builds normally into the same store.
    ex.execute(spark.createDataset(
      (1 to 50).map(i => Person(s"p-$i", "CA"))).repartition(4))
    assert(ex.queryAll().count() == 1)
  }
}

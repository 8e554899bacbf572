package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}

/** The `_epoch` seqlock's crash contract (round 6): a writer that dies
  * mid-mutation strands an ODD epoch. Readers must DEGRADE — bounded
  * spin, then best-effort read — never block forever behind the corpse;
  * and any subsequent maintenance entry (recover(), or the next
  * execute) must heal the epoch back to even so readers return to the
  * consistent fast path.
  */
class EpochSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def readEpochFile(store: String): Long = {
    val in = new java.io.DataInputStream(
      Files.newInputStream(Paths.get(store, "_epoch")))
    try in.readLong() finally in.close()
  }

  private def writeEpochFile(store: String, v: Long): Unit = {
    val out = new java.io.DataOutputStream(
      Files.newOutputStream(Paths.get(store, "_epoch")))
    try out.writeLong(v) finally out.close()
    // The engine writes through Hadoop's checksummed LocalFileSystem;
    // this raw rewrite invalidates the sidecar — drop it (a real crash
    // leaves a CONSISTENT odd-epoch file; the raw write is only the
    // test's way of planting one).
    Files.deleteIfExists(Paths.get(store, "._epoch.crc"))
  }

  test("mutations leave the epoch even; a stranded odd epoch degrades, recover() heals") {
    val store = TestTmp.dir("graft-epoch")
    val ex = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 4, finalParts = 2))
    ex.execute(spark.createDataset(
      (1 to 50).map(i => Person(s"p-$i", if (i % 2 == 0) "CA" else "TX"))))

    // A completed batch leaves the store quiescent (even epoch).
    val e0 = readEpochFile(store)
    assert(e0 % 2 === 0L, s"epoch odd after a completed batch: $e0")

    // Simulate a writer that died mid-mutation: strand an odd epoch.
    writeEpochFile(store, e0 + 1)
    val t0 = System.nanoTime()
    val rows = ex.queryAll().collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // Bounded degradation: the read completes (with the right answer —
    // the files themselves are consistent here) instead of spinning
    // forever behind the corpse.
    assert(rows.map(_.getLong(2)).sum === 50L)
    assert(sec < 60.0, s"reader blocked ${sec}s behind a stranded epoch")

    // Any maintenance entry heals the epoch...
    ex.recover()
    assert(readEpochFile(store) % 2 === 0L)
    // ...and consistent reads are fast again (no spin path).
    val t1 = System.nanoTime()
    assert(ex.queryAll().collect().map(_.getLong(2)).sum === 50L)
    assert((System.nanoTime() - t1) / 1e9 < 10.0)
  }
}

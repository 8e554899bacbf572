package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}

/** `reshapeTo` — layout migration (the supported path when a store
  * outgrows its fanIn): results identical across the migration,
  * tombstones folded en route, seq continuity preserved (updates after
  * the reshape must still kill pre-reshape rows), incremental updates
  * keep working on the destination, and the old layout refuses to open
  * the new store. */
class ReshapeSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = TestTmp.dir("graft-reshape")

  private def counts(ex: Executer[Person, StatePop]): Map[String, Long] =
    ex.queryAll().as[(String, String, Long)].collect()
      .map { case (_, s, c) => s -> c }.toMap

  test("reshape preserves results, folds tombstones, and stays updatable") {
    val src = new Executer(PeopleCountByState, tmp(),
      ExecuterConfig(fanIn = 8, finalParts = 4))
    val people =
      (1 to 300).map(i => Person(s"p-$i", "CA")) ++
      (301 to 500).map(i => Person(s"p-$i", "TX")) ++
      (501 to 520).map(i => Person(s"p-$i", "NY"))
    src.execute(spark.createDataset(people))
    // Updates so the source carries live tombstones into the reshape.
    src.execute(spark.createDataset(Seq(Person("p-1", "TX"), Person("p-2", "NY"))))
    src.deleteDocuments(Seq("p-520"))
    val before = counts(src)
    assert(before == Map("CA" -> 298L, "TX" -> 201L, "NY" -> 20L))

    val dstPath = tmp() + "/wide"
    val dst = src.reshapeTo(dstPath, ExecuterConfig(fanIn = 32, finalParts = 8))

    // Identical results under the new layout; point reads prune there too.
    assert(counts(dst) == before)
    assert(dst.query("CA").collect().toSeq == Seq(StatePop("CA", 298L)))
    // Tombstones were applied en route: the destination starts clean
    // (the source still carries its live ones).
    assert(dst.storeStats()("tombstones") == 0L)
    assert(src.storeStats()("tombstones") > 0L)
    // The source is untouched and still serves.
    assert(counts(src) == before)

    // Seq continuity: an update on the destination must kill rows written
    // BEFORE the reshape (they keep their original seq values).
    dst.execute(spark.createDataset(Seq(Person("p-3", "TX"))))
    assert(counts(dst) == Map("CA" -> 297L, "TX" -> 202L, "NY" -> 20L))
    // And a doc updated pre-reshape updates again cleanly.
    dst.execute(spark.createDataset(Seq(Person("p-1", "CA"))))
    assert(counts(dst) == Map("CA" -> 298L, "TX" -> 201L, "NY" -> 20L))

    // Opening the destination with the old layout fails fast.
    val stale = new Executer(PeopleCountByState, dstPath,
      ExecuterConfig(fanIn = 8, finalParts = 4))
    assertThrows[IllegalArgumentException] { stale.query("CA").collect() }

    // A second reshape into an occupied directory refuses.
    assertThrows[IllegalArgumentException] {
      src.reshapeTo(dstPath, ExecuterConfig(fanIn = 16, finalParts = 4))
    }
  }

  test("reshape under a custom strict lease: source stays held, destination claims its own") {
    // A conditional-put style provider throws on double-acquire. Sharing
    // the source's instance with the destination used to deadlock here
    // (inner withLease re-acquiring the held source lease) and released
    // the source lease mid-reshape on unwind.
    class StrictLease extends graft.core.LeaseProvider {
      var held = false
      var acquisitions = 0
      override def acquire(info: String): Unit = synchronized {
        if (held) throw new IllegalStateException("already held")
        held = true; acquisitions += 1
      }
      override def release(): Unit = synchronized { held = false }
    }
    val srcLease = new StrictLease
    val src = new Executer(PeopleCountByState, tmp(),
      ExecuterConfig(fanIn = 8, finalParts = 4), Some(srcLease))
    src.execute(spark.createDataset(
      (1 to 50).map(i => Person(s"l-$i", "S" + (i % 3)))))
    val before = counts(src)

    val dst = src.reshapeTo(tmp() + "/w",
      ExecuterConfig(fanIn = 16, finalParts = 4))
    assert(counts(dst) == before)
    assert(!srcLease.held, "source lease leaked after reshape")
    assert(srcLease.acquisitions == 2, // build + reshape, never the dst
      s"source lease acquired ${srcLease.acquisitions} times")
  }

  test("crash between map landing and tree build: destination recovers via the WAL sentinel") {
    val src = new Executer(PeopleCountByState, tmp(),
      ExecuterConfig(fanIn = 8, finalParts = 4))
    src.execute(spark.createDataset(
      (1 to 100).map(i => Person(s"c-$i", "S" + (i % 7)))))
    val before = counts(src)

    val dstPath = tmp() + "/crash"
    val cfg = ExecuterConfig(fanIn = 16, finalParts = 4)
    src.reshapeTo(dstPath, cfg)
    // Reconstruct the documented crash window: map output committed, the
    // full-rebuild WAL sentinel still pending, no reduce tree yet.
    val treeDir = new java.io.File(s"$dstPath/reduce_tree")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe); f.delete()
    }
    wipe(treeDir)
    val out = new java.io.DataOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(dstPath).resolve("dirty.pairs")))
    out.writeInt(1); TestTmp.writeStr(out, ""); out.writeInt(-1); out.close()

    val reopened = new Executer(PeopleCountByState, dstPath, cfg)
    reopened.recover()
    assert(counts(reopened) == before)
    // The source was never touched by any of this.
    assert(counts(src) == before)
  }

  test("reshape equals a from-scratch build under the destination layout") {
    val docs = (1 to 400).map(i => Person(s"d-$i", "S" + (i % 13)))
    val src = new Executer(PeopleCountByState, tmp(),
      ExecuterConfig(fanIn = 8, finalParts = 4))
    src.execute(spark.createDataset(docs))
    src.execute(spark.createDataset(Seq(Person("d-7", "S0"), Person("d-8", "S1"))))

    val wideCfg = ExecuterConfig(fanIn = 64, finalParts = 16)
    val dst = src.reshapeTo(tmp() + "/w", wideCfg)

    val fresh = new Executer(PeopleCountByState, tmp(), wideCfg)
    val mutated = docs.map(d =>
      if (d.id == "d-7") d.copy(state = "S0")
      else if (d.id == "d-8") d.copy(state = "S1") else d)
    fresh.execute(spark.createDataset(mutated))
    assert(counts(dst) == counts(fresh))
  }
}

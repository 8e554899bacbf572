package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}
import graft.streaming.CdcConsumer

/** `CdcConsumer.forkAt` — forking a whole two-store pipeline at a
  * consistent ledger cut (SURVEY §21.5): the upstream branches at the
  * pair's cursor, the downstream at the pair's generation, and the
  * fork resumes INCREMENTAL polling from its seeded cursor with no
  * bootstrap resync. Pins: the fork lands exactly the pinned cut's
  * state; a fresh poll is a no-op (strict — a resync would throw);
  * fork and original evolve independently through further churn on
  * both sides; the fork's ledger answers pinned reads from its first
  * generation; half-applied generations refuse to fork. */
class PipelineForkSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val cfg = ExecuterConfig(fanIn = 4, finalParts = 2)

  private def bands(c: CdcConsumer[StatePop, BandPop]): Map[String, (Long, Long)] =
    c.executer.queryAll().as[(String, String, Long, Long)].collect()
      .map { case (_, b, s, p) => b -> ((s, p)) }.toMap

  private def rollup(ex: Executer[Person, StatePop]): Map[String, (Long, Long)] =
    ex.queryAll().as[(String, String, Long)].collect()
      .groupBy(_._2.take(1)).map { case (b, rows) =>
        b -> ((rows.length.toLong, rows.map(_._3).sum))
      }

  test("a pipeline forked at a ledger pair is consistent, incremental, " +
      "and independent") {
    val up = new Executer(PeopleCountByState,
      TestTmp.dir("graft-fork-up"), cfg)
    up.execute(spark.createDataset(Seq(
      Person("a", "CA"), Person("b", "TX"), Person("c", "CA"),
      Person("d", "NV"))))
    val consumer = new CdcConsumer(up, StateBandCounts,
      TestTmp.dir("graft-fork-down"), cfg, strict = true)
    consumer.syncOnce() // the cut we'll fork at
    val cutBands = bands(consumer)
    up.execute(spark.createDataset(Seq(Person("e", "OR"))))
    consumer.syncOnce() // pipeline moves past the cut
    assert(bands(consumer) != cutBands)

    val (dg, uc) = consumer.syncLog.head
    up.execute(spark.createDataset(Seq(Person("f", "WA")))) // keeps moving
    val upBrPath = TestTmp.dir("graft-fork-up-br") + "/s"
    val fork = consumer.forkAt(dg, upBrPath,
      TestTmp.dir("graft-fork-down-br") + "/s")

    // The fork IS the pinned cut, on both stores.
    assert(bands(fork) == cutBands)
    assert(fork.cursor == 0L && fork.cursorAsOf(0L) == 0L)
    val upBr = new Executer(PeopleCountByState, upBrPath, cfg)
    assert(rollup(upBr) == cutBands, "up-branch state is the cut's cursor")

    // A fresh poll is an incremental NO-OP — strict mode would throw on
    // any resync fallback, and the cursor stays put.
    fork.syncOnce()
    assert(bands(fork) == cutBands && fork.cursor == 0L)
    assert(fork.health.resyncCount == 0L, "no bootstrap resync on a fork")

    // Fork and original evolve independently.
    upBr.execute(spark.createDataset(Seq(Person("g", "TX"))))
    fork.syncOnce()
    assert(bands(fork) == rollup(upBr))
    consumer.syncOnce()
    assert(bands(consumer) == rollup(up))
    assert(bands(consumer) != bands(fork))

    // A downstream generation the ledger does not record refuses to
    // fork (half-applied batches are consistent with no single cursor).
    intercept[IllegalArgumentException] {
      consumer.forkAt(dg + 9000, TestTmp.dir("graft-fork-x") + "/s",
        TestTmp.dir("graft-fork-y") + "/s")
    }
  }

  test("a 3-stage chain forks transitively, hop by hop, and the fork " +
      "converges at every stage under its own churn") {
    val up = new Executer(PeopleCountByState,
      TestTmp.dir("graft-fork3-up"), cfg)
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AB"), Person("p3", "BA"),
      Person("p4", "CC"))))
    val mid = new CdcConsumer(up, StateBandCountsDelta,
      TestTmp.dir("graft-fork3-mid"), cfg, strict = true)
    mid.syncOnce()
    val top = new CdcConsumer(mid.executer, GrandTotals,
      TestTmp.dir("graft-fork3-top"), cfg, strict = true)
    top.syncOnce()
    // Move the chain past the cut we'll fork at.
    up.execute(spark.createDataset(Seq(Person("p5", "DD"))))
    mid.syncOnce(); top.syncOnce()
    up.execute(spark.createDataset(Seq(Person("p6", "EE"))))
    mid.syncOnce() // top lags — the chain is mid-churn

    def totals(c: CdcConsumer[BandPop, TotalPop]): (Long, Long) =
      c.executer.queryAll().as[(String, String, Long, Long)].collect()
        .map { case (_, _, nb, p) => (nb, p) }.head

    // Bottom-up: stage 2's fork produces the stage-1 branch; stage 3
    // forks ONTO stage 2's branch (the transitive hop).
    val (gTop, cMid) = top.syncLog.head
    val up1BrPath = TestTmp.dir("graft-fork3-up-br") + "/s"
    val midFork = mid.forkAt(cMid, up1BrPath,
      TestTmp.dir("graft-fork3-mid-br") + "/s")
    val topFork = top.forkOnto(gTop, midFork.executer,
      TestTmp.dir("graft-fork3-top-br") + "/s")

    // Every hop of the fork is the pinned cut.
    assert(totals(topFork) ==
      top.executer.queryAllAt(gTop).as[(String, String, Long, Long)]
        .collect().map { case (_, _, nb, p) => (nb, p) }.head)
    assert(bands(midFork) ==
      mid.executer.queryAllAt(cMid).as[(String, String, Long, Long)]
        .collect().map { case (_, b, s, p) => b -> ((s, p)) }.toMap)

    // Churn the FORK's stage 1; both fork consumers converge (strict —
    // any resync would throw); the original chain never sees it.
    val upBr = new Executer(PeopleCountByState, up1BrPath, cfg)
    upBr.execute(spark.createDataset(Seq(Person("q1", "FF"))))
    midFork.syncOnce(); topFork.syncOnce()
    assert(bands(midFork) == rollup(upBr))
    assert(totals(topFork) ==
      ((bands(midFork).size.toLong, bands(midFork).values.map(_._2).sum)))
    assert(!rollup(up).contains("F"), "the original never sees fork churn")

    // …and the original chain keeps converging on its own history.
    mid.syncOnce(); top.syncOnce()
    assert(bands(mid) == rollup(up))
    assert(totals(top) ==
      ((bands(mid).size.toLong, bands(mid).values.map(_._2).sum)))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}
import graft.streaming.CdcConsumer

/** The CDC chain as a CONTINUOUS micro-batch consumer (VERDICT r9 next
  * #8): two stores chained through `changedKeysSince`/`queryKeys`, the
  * downstream driven by a streaming query (`foreachBatch` over a tick
  * stream), polled repeatedly under churn, with the durable cursor
  * surviving a consumer restart — the poll-loop spelling that
  * ChainedCdcSpec's one-shot syncs and q106's build-time sync don't
  * cover. */
class StreamingCdcSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val cfg = ExecuterConfig(fanIn = 4, finalParts = 2)

  private def model(up: Executer[Person, StatePop]): Map[String, (Long, Long)] =
    up.queryAll().as[(String, String, Long)].collect()
      .groupBy(_._2.take(1))
      .map { case (b, rows) => b -> (rows.length.toLong, rows.map(_._3).sum) }

  private def bands(c: CdcConsumer[StatePop, BandPop]): Map[String, (Long, Long)] =
    c.queryAll().as[(String, String, Long, Long)].collect()
      .map { case (_, b, s, p) => b -> (s, p) }.toMap

  test("a streaming-driven consumer tracks continuous upstream churn " +
      "and its cursor survives a restart") {
    val upStore = TestTmp.dir("graft-scdc-up")
    val downStore = TestTmp.dir("graft-scdc-down")
    val ckpt = TestTmp.dir("graft-scdc-ckpt")
    val up = new Executer(PeopleCountByState, upStore, cfg)

    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AB"), Person("p3", "BA"),
      Person("p4", "CC"))))

    // strict: this spec exercises the INCREMENTAL protocol — a poll
    // failure converged by the resilient fallback would be a silent
    // regression (ADVICE r11), so it must throw instead.
    val consumer = new CdcConsumer(up, StateBandCountsDelta, downStore, cfg,
      strict = true)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ticks = MemoryStream[Int]
    // ProcessingTime(0), not AvailableNow: the consumer is a LONG-LIVED
    // poll loop — AvailableNow drains once and STOPS, so later ticks
    // would never fire a sync.
    val q = consumer.attach(ticks.toDS(), ckpt,
      trigger = Trigger.ProcessingTime(0))

    def poll(): Unit = {
      ticks.addData(1)
      q.processAllAvailable()
    }

    // Bootstrap poll: full snapshot sync — health shows exactly one
    // (non-fallback) resync, caught up, full-snapshot churn marker.
    poll()
    assert(bands(consumer) == model(up))
    val h0 = consumer.health
    assert(h0.resyncCount == 1 && h0.fallbackResyncCount == 0 &&
      h0.lag == 0 && h0.lastPollChurn == -1L,
      s"bootstrap health: $h0")

    // Continuous churn: value changes, a vanishing key, a brand-new
    // key, and a full-key delete — one poll after each mutation, plus
    // one poll covering TWO accumulated generations (the consumer was
    // "behind"; changedKeysSince spans the gap).
    up.execute(spark.createDataset(Seq(Person("p4", "BA")))) // CC vanishes
    assert(consumer.health.lag == 1,
      "an unapplied upstream generation must show as lag")
    poll()
    assert(bands(consumer) == model(up))
    assert(!bands(consumer).contains("C"),
      "vanished upstream key must arrive as a downstream delete")
    val h1 = consumer.health
    assert(h1.resyncCount == 1 && h1.lag == 0 && h1.lastPollChurn == 2L,
      s"incremental poll over {CC vanished, BA changed} must report " +
        s"churn 2 and no new resync: $h1")

    up.execute(spark.createDataset(Seq(Person("p5", "DD"))))
    up.execute(spark.createDataset(Seq(Person("p6", "AB")))) // 2 gens, 1 poll
    poll()
    assert(bands(consumer) == model(up))

    up.delete("AB")
    poll()
    assert(bands(consumer) == model(up))

    // A tick with no upstream churn is a no-op (churn 0, no resync).
    val before = bands(consumer)
    poll()
    assert(bands(consumer) == before)
    val h2 = consumer.health
    assert(h2.lastPollChurn == 0L && h2.resyncCount == 1 &&
      h2.fallbackResyncCount == 0, s"no-op poll health: $h2")
    q.stop()

    // RESTART: a fresh consumer over the same store resumes from the
    // persisted cursor — churn that landed while it was down arrives
    // on its first poll, with no re-bootstrap.
    up.execute(spark.createDataset(Seq(Person("p1", "CA"))))
    val consumer2 = new CdcConsumer(up, StateBandCountsDelta, downStore, cfg)
    assert(consumer2.cursor >= 0, "cursor must persist across restarts")
    consumer2.syncOnce()
    assert(bands(consumer2) == model(up))

    // FAN-OUT: a second, independent consumer (own store, own cursor)
    // bootstraps late off the same upstream and then tracks it on its
    // own poll cadence — consumers never coordinate; each holds only
    // its own cursor. This is the pipeline-DAG shape: one maintained
    // index feeding N downstream stages.
    val down2 = TestTmp.dir("graft-scdc-down2")
    val late = new CdcConsumer(up, StateBandCountsDelta, down2, cfg)
    late.syncOnce() // bootstrap sees the CURRENT upstream state
    assert(bands(late) == model(up))
    up.execute(spark.createDataset(Seq(Person("p7", "EE"))))
    late.syncOnce() // late consumer catches up...
    assert(bands(late) == model(up))
    assert(bands(consumer2) != model(up),
      "consumers are independent: the idle one must NOT have moved")
    consumer2.syncOnce() // ...and the first one catches up on ITS poll
    assert(bands(consumer2) == model(up))
  }

  test("a diff-driven consumer (viaDiff) syncs purely from the " +
      "before/after feed — no refetch — and matches the refetch-based " +
      "consumer under churn") {
    val upStore = TestTmp.dir("graft-dcdc-up")
    val up = new Executer(PeopleCountSingle, upStore, cfg)
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AB"), Person("p3", "BA"),
      Person("p4", "CC"))))

    val byFetch = new CdcConsumer(up, StateBandCountsDelta,
      TestTmp.dir("graft-dcdc-fetch"), cfg)
    val byDiff = new CdcConsumer(up, StateBandCountsDelta,
      TestTmp.dir("graft-dcdc-diff"), cfg)
    byFetch.syncOnce()
    byDiff.syncOnce()
    assert(bands(byDiff) == model(up))

    def churnAndPoll(mut: => Unit): Unit = {
      mut
      byFetch.syncOnce()
      byDiff.syncOnce(viaDiff = true)
      assert(bands(byDiff) == model(up), "diff-driven consumer diverged")
      assert(bands(byDiff) == bands(byFetch),
        "diff- and refetch-driven consumers must converge identically")
    }

    // Value change + vanishing key (CC's only contributor re-keys).
    churnAndPoll { up.execute(spark.createDataset(Seq(Person("p4", "BA")))) }
    assert(!bands(byDiff).contains("C"),
      "the feed's in-band delete verdict must reach the diff consumer")
    // Brand-new key, then TWO accumulated generations in one poll.
    churnAndPoll {
      up.execute(spark.createDataset(Seq(Person("p5", "DD"))))
      up.execute(spark.createDataset(Seq(Person("p6", "AB"))))
    }
    // Full-key delete upstream.
    churnAndPoll { up.delete("AB") }
    // No-churn poll is a no-op.
    churnAndPoll { () }
  }

  test("a consumer whose cursor fell past the compact() pruning horizon " +
      "recovers by full resync instead of failing its poll") {
    val upStore = TestTmp.dir("graft-hzcdc-up")
    val downStore = TestTmp.dir("graft-hzcdc-down")
    // Aggressive retention so one compact() prunes the changed-keys
    // trail right up to the current generation.
    val up = new Executer(PeopleCountSingle, upStore,
      cfg.copy(manifestRetention = 1, manifestGraceMs = 0L))
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "BB"), Person("p3", "CC"))))

    // strict is SAFE here: the horizon recovery is the deliberate
    // pre-check resync, not the NonFatal fallback strict disables.
    val c = new CdcConsumer(up, StateBandCountsDelta, downStore, cfg,
      strict = true)
    c.syncOnce()
    assert(bands(c) == model(up))
    val cursorBefore = c.cursor

    // While the consumer is down: churn (including a vanishing key the
    // resync's sweep must handle), then compact() prunes the trail.
    up.execute(spark.createDataset(Seq(Person("p2", "AA")))) // BB vanishes
    up.execute(spark.createDataset(Seq(Person("p4", "DD"))))
    up.compact()
    assert(cursorBefore < up.changedHorizonVersion(),
      "precondition: the cursor must be past the horizon")
    // The raw surface fails loudly by contract...
    intercept[IllegalStateException] { up.changedKeysSince(cursorBefore) }

    // ...but the consumer's poll recovers: full resync, exact state.
    // The recovery is counted as a resync but NOT a fallback (it came
    // from the horizon pre-check, available even in strict mode).
    c.syncOnce()
    assert(bands(c) == model(up))
    assert(!bands(c).contains("B"),
      "key deleted while the consumer was blind must be swept by the resync")
    assert(c.cursor == up.snapshotVersion())
    val hr = c.health
    assert(hr.resyncCount == 2 && hr.fallbackResyncCount == 0 &&
      hr.lastPollChurn == -1L, s"horizon-recovery health: $hr")
    // Steady state resumes incrementally after the recovery.
    up.execute(spark.createDataset(Seq(Person("p5", "EE"))))
    c.syncOnce()
    assert(bands(c) == model(up))
  }

  test("a diff-mode consumer whose cursor generation was GC'd by " +
      "ordinary retention (no compact) recovers by resync instead of " +
      "crash-looping") {
    val upStore = TestTmp.dir("graft-gccdc-up")
    val downStore = TestTmp.dir("graft-gccdc-down")
    // Ordinary retention GC with zero grace: each publish deletes data
    // files retired more than one generation ago — the changed-keys
    // horizon never moves (no compact), so the consumer's pre-check
    // passes while diffSince's before-side time travel is broken.
    val up = new Executer(PeopleCountSingle, upStore,
      cfg.copy(manifestRetention = 1, manifestGraceMs = 0L))
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "BB"))))

    val c = new CdcConsumer(up, StateBandCountsDelta, downStore, cfg)
    c.syncOnce()
    val cursorBefore = c.cursor

    // Churn across several generations so the cursor generation's
    // files are GC'd (value moves + a vanishing key while blind).
    up.execute(spark.createDataset(Seq(Person("p2", "AA")))) // BB vanishes
    up.execute(spark.createDataset(Seq(Person("p3", "CC"))))
    up.execute(spark.createDataset(Seq(Person("p3", "CA"))))
    up.execute(spark.createDataset(Seq(Person("p4", "DD"))))
    assert(cursorBefore >= up.changedHorizonVersion(),
      "precondition: the horizon pre-check must NOT fire (no compact ran)")
    // Precondition: the raw diff surface is actually broken for this
    // cursor (the before-side snapshot's files are gone).
    intercept[Throwable] { up.diffSince(cursorBefore).collect() }

    // A STRICT consumer over the same broken trail must FAIL its poll
    // loudly instead of being converged by the fallback — that is the
    // whole point of the mode (ADVICE r11). Same store+cursor state:
    // build it on a copy of the downstream store directory.
    val strictDown = TestTmp.dir("graft-gccdc-strict")
    copyDir(downStore, strictDown)
    val cs = new CdcConsumer(up, StateBandCountsDelta, strictDown, cfg,
      strict = true)
    intercept[Throwable] { cs.syncOnce(viaDiff = true) }
    assert(cs.health.fallbackResyncCount == 0 && cs.cursor == cursorBefore,
      "a strict consumer must neither resync nor advance its cursor on " +
        "a failed incremental poll")

    // The (default, resilient) poll must still converge — fallback
    // resync, cursor landed, and the recovery is COUNTED.
    c.syncOnce(viaDiff = true)
    assert(bands(c) == model(up))
    assert(!bands(c).contains("B"),
      "key deleted while the consumer was blind must be swept")
    assert(c.cursor == up.snapshotVersion())
    val hf = c.health
    assert(hf.fallbackResyncCount == 1 && hf.resyncCount == 2 &&
      hf.lastPollChurn == -1L, s"fallback-recovery health: $hf")
    // And incremental diff polling resumes cleanly afterwards — the
    // fallback counter must NOT move again.
    up.execute(spark.createDataset(Seq(Person("p5", "EE"))))
    c.syncOnce(viaDiff = true)
    assert(bands(c) == model(up))
    assert(c.health.fallbackResyncCount == 1 && c.health.lastPollChurn == 1L,
      s"post-recovery incremental health: ${c.health}")
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    val s = java.nio.file.Files.walk(src)
    try s.forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally s.close()
  }

  test("re-bootstrap onto a pre-existing downstream store deletes " +
      "documents the snapshot no longer covers") {
    val upStore = TestTmp.dir("graft-rbcdc-up")
    val downStore = TestTmp.dir("graft-rbcdc-down")
    val up = new Executer(PeopleCountSingle, upStore, cfg)
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "BB"))))

    // First bootstrap lands... and the crash window hits AFTER the
    // downstream mutation but BEFORE the cursor write (the documented
    // at-least-once replay window): simulate by deleting the cursor.
    val c1 = new CdcConsumer(up, StateBandCountsDelta, downStore, cfg)
    c1.syncOnce()
    assert(bands(c1) == model(up))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(downStore, "_cdc_cursor"))

    // While the consumer is down, BB's only contributor re-keys away —
    // the key is GONE from every later snapshot, so the re-bootstrap's
    // upsert alone would never delete the downstream's B-band document.
    up.execute(spark.createDataset(Seq(Person("p2", "AA"))))

    val c2 = new CdcConsumer(up, StateBandCountsDelta, downStore, cfg)
    assert(c2.cursor < 0)
    c2.syncOnce()
    assert(bands(c2) == model(up),
      "re-bootstrap must converge to the upstream's current state")
    assert(!bands(c2).contains("B"),
      "stale downstream document (deleted upstream key) must be swept")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig, MapReduceTask}

/** Downstream stage of a two-index CDC chain: its DOCUMENTS are the
  * upstream count-by-state index's reduce rows (doc id = the state),
  * rolled up by the state's first letter. Mirrors ops.PriorityBands
  * (q106) at spec scale. */
case class BandPop(band: String, states: Long, people: Long)

object StateBandCounts extends MapReduceTask[StatePop, BandPop] {
  def map(docs: Iterator[StatePop]): Iterator[(String, BandPop)] =
    docs.map(s => (s.state, BandPop(s.state.take(1), 1L, s.count)))
  def reduce(entries: Iterator[BandPop]): Iterator[BandPop] =
    entries.toSeq.groupBy(_.band).map { case (b, es) =>
      BandPop(b, es.map(_.states).sum, es.map(_.people).sum)
    }.iterator
  def reduceKey(e: BandPop): String = e.band
  def documentId(d: StatePop): String = d.state
  override def singleOutput: Boolean = true
}

/** The DELTA-path spelling of the downstream stage: production's
  * PriorityBands (`ops/IndexQueries.scala`) declares `deltaReducible`,
  * so the q106 chain's 5-doc sync batches run the abelian-group delta
  * maintenance — a path the recompute-only [[StateBandCounts]] above
  * never pins (VERDICT r9 #1's identified spec gap). Same shape:
  * counts + an exact decimal sum, negate = componentwise minus. */
object StateBandCountsDelta extends MapReduceTask[StatePop, BandPop] {
  def map(docs: Iterator[StatePop]): Iterator[(String, BandPop)] =
    StateBandCounts.map(docs)
  def reduce(entries: Iterator[BandPop]): Iterator[BandPop] =
    StateBandCounts.reduce(entries)
  def reduceKey(e: BandPop): String = e.band
  def documentId(d: StatePop): String = d.state
  override def singleOutput: Boolean = true
  override def deltaReducible: Boolean = true
  override def negate(e: BandPop): BandPop =
    BandPop(e.band, -e.states, -e.people)
  override def isZero(e: BandPop): Boolean =
    e.states == 0L && e.people == 0L
}

/** Two Executers chained through the CDC surface (VERDICT r8 #8,
  * the q106 protocol): the downstream store is synchronized by
  * snapshot + `changedKeysSince` + point-pruned `queryKeys` refetch +
  * explicit deletes for vanished keys, and after every sync must equal
  * a from-scratch recompute over the upstream's CURRENT state —
  * including the case a CDC feed gets wrong first: an upstream key
  * whose last contributor re-keys away VANISHES, and the downstream
  * must receive that as a delete, not silence. */
class ChainedCdcSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val cfg = ExecuterConfig(fanIn = 4, finalParts = 2)

  /** One consumer poll: sync `down` with everything `up` changed since
    * the consumer's last-seen version; returns the new cursor. */
  private def cdcSync(up: Executer[Person, StatePop],
      down: Executer[StatePop, BandPop], sinceV: Long): Long = {
    val changed = up.changedKeysSince(sinceV).as[String].collect().toSeq
    if (changed.nonEmpty) {
      val live = up.queryKeys(changed)
        .select($"state", $"count").as[StatePop].collect().toSeq
      if (live.nonEmpty) down.execute(spark.createDataset(live))
      val liveKeys = live.map(_.state).toSet
      val vanished = changed.filterNot(liveKeys)
      if (vanished.nonEmpty) down.deleteDocuments(vanished)
    }
    up.snapshotVersion()
  }

  /** The two-stage recompute the chain must equal. */
  private def model(up: Executer[Person, StatePop]): Map[String, (Long, Long)] =
    up.queryAll().as[(String, String, Long)].collect()
      .groupBy(_._2.take(1))
      .map { case (b, rows) =>
        b -> (rows.length.toLong, rows.map(_._3).sum)
      }

  private def bands(down: Executer[StatePop, BandPop]): Map[String, (Long, Long)] =
    down.queryAll().as[(String, String, Long, Long)].collect()
      .map { case (_, b, s, p) => b -> (s, p) }.toMap

  test("downstream index tracks upstream churn through changedKeysSince, " +
      "including a vanished upstream key arriving as a delete") {
    val upStore = TestTmp.dir("graft-cdc-up")
    val downStore = TestTmp.dir("graft-cdc-down")
    val up = new Executer(PeopleCountByState, upStore, cfg)
    val down = new Executer(StateBandCounts, downStore, cfg)

    // Upstream generation 0: states AA, AB, BA, CC.
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AA"), Person("p3", "AB"),
      Person("p4", "BA"), Person("p5", "CC"))))
    // Consumer bootstraps from the snapshot it first sees.
    var cursor = up.snapshotVersion()
    down.execute(up.queryAllAt(cursor)
      .select($"state", $"count").as[StatePop])
    assert(bands(down) == model(up))

    // Churn 1: p5 (CC's ONLY contributor) re-keys to BA — CC vanishes;
    // p1 moves AA -> AB.
    up.execute(spark.createDataset(Seq(
      Person("p5", "BA"), Person("p1", "AB"))))
    cursor = cdcSync(up, down, cursor)
    assert(bands(down) == model(up))
    assert(!bands(down).contains("C"), "vanished key must reach the consumer as a delete")

    // Churn 2: a brand-new key (DD) plus a full-key delete upstream.
    up.execute(spark.createDataset(Seq(Person("p6", "DD"))))
    up.delete("AB")
    cursor = cdcSync(up, down, cursor)
    assert(bands(down) == model(up))

    // A no-op poll is a no-op sync.
    val before = bands(down)
    cursor = cdcSync(up, down, cursor)
    assert(bands(down) == before)
  }

  test("delta-reducible downstream (production PriorityBands shape) " +
      "tracks upstream churn through the same CDC sync") {
    val upStore = TestTmp.dir("graft-cdcd-up")
    val downStore = TestTmp.dir("graft-cdcd-down")
    val up = new Executer(PeopleCountByState, upStore, cfg)
    val down = new Executer(StateBandCountsDelta, downStore, cfg)

    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AA"), Person("p3", "AB"),
      Person("p4", "BA"), Person("p5", "CC"))))
    var cursor = up.snapshotVersion()
    // The production chain's initial sync is a DISTRIBUTED read of the
    // upstream snapshot (a file scan, not a local relation) — keep that
    // shape here so the downstream's first build takes the same path.
    down.execute(up.queryAllAt(cursor)
      .select($"state", $"count").as[StatePop])
    assert(bands(down) == model(up))

    // Churn 1 (mirrors q41's shape: values change, one key gains, one
    // vanishes): the downstream re-sync batch then runs the DELTA path.
    up.execute(spark.createDataset(Seq(
      Person("p5", "BA"), Person("p1", "AB"))))
    cursor = cdcSync(up, down, cursor)
    assert(bands(down) == model(up))
    assert(!bands(down).contains("C"))

    // Churn 2: new key + full-key delete, synced through deltas again.
    up.execute(spark.createDataset(Seq(Person("p6", "DD"))))
    up.delete("AB")
    cursor = cdcSync(up, down, cursor)
    assert(bands(down) == model(up))

    // Churn 3: REPEATED small syncs (the steady-state consumer poll) —
    // each lands another delta on the same touched bands; accumulated
    // merge-on-read state must keep resolving to the model.
    for (i <- 7 to 9) {
      up.execute(spark.createDataset(Seq(Person(s"p$i", "BA"))))
      cursor = cdcSync(up, down, cursor)
      assert(bands(down) == model(up), s"after poll $i")
    }
  }

  test("cross-store snapshot pinning: a 3-stage chain read mid-churn is " +
      "consistent at every hop when pinned through the sync ledger, " +
      "while naive current-generation reads disagree") {
    import graft.streaming.CdcConsumer
    val up = new Executer(PeopleCountByState,
      TestTmp.dir("graft-pin-up"), cfg)
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AB"), Person("p3", "BA"),
      Person("p4", "CC"))))
    val mid = new CdcConsumer(up, StateBandCountsDelta,
      TestTmp.dir("graft-pin-mid"), cfg, strict = true)
    mid.syncOnce()
    val top = new CdcConsumer(mid.executer, GrandTotals,
      TestTmp.dir("graft-pin-top"), cfg, strict = true)
    top.syncOnce()

    // Mid-churn: the upstream moves on and the MIDDLE stage applies it,
    // but the top consumer does not poll; then the upstream churns
    // again with NOBODY polling. Every store is now at a different
    // point of the same logical history.
    up.execute(spark.createDataset(Seq(Person("p5", "DD")))) // new band D
    mid.syncOnce()
    up.execute(spark.createDataset(Seq(Person("p6", "EE")))) // mid behind too

    def asBands(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.as[(String, String, Long, Long)].collect()
        .map { case (_, b, s, p) => b -> ((s, p)) }.toMap
    def rollupStates(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.as[(String, String, Long)].collect()
        .groupBy(_._2.take(1))
        .map { case (b, rows) => b -> ((rows.length.toLong, rows.map(_._3).sum)) }
    def asTotals(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      df.as[(String, String, Long, Long)].collect()
        .map { case (_, _, nb, p) => (nb, p) }.head
    def rollupBands(m: Map[String, (Long, Long)]): (Long, Long) =
      (m.size.toLong, m.values.map(_._2).sum)

    // Naive cross-store reads mid-churn DISAGREE: mid's current state
    // includes band D, which top has never applied.
    assert(rollupBands(asBands(mid.queryAll())) != asTotals(top.queryAll()),
      "precondition: the chain must actually be mid-churn for this test")

    // The pinned read: ONE ledger row of the top consumer names the
    // (top generation, mid generation) pair of its last completed sync;
    // cursorAsOf maps that mid generation to the upstream generation it
    // reflects. All three reads are immutable time travel.
    val (gTop, cMid) = top.syncLog.last
    val topView = asTotals(top.executer.queryAllAt(gTop))
    val midView = asBands(mid.executer.queryAllAt(cMid))
    val upView = rollupStates(up.queryAllAt(mid.cursorAsOf(cMid)))
    assert(upView == midView,
      "pinned stage-1 view must roll up to the pinned stage-2 view")
    assert(rollupBands(midView) == topView,
      "pinned stage-2 view must roll up to the pinned stage-3 view")

    // Once both consumers catch up, the pinned recipe holds at the NEW
    // head too — and now agrees with naive current reads.
    mid.syncOnce()
    top.syncOnce()
    val (gTop2, cMid2) = top.syncLog.last
    assert(asBands(mid.executer.queryAllAt(cMid2)) == asBands(mid.queryAll()))
    assert(rollupStates(up.queryAllAt(mid.cursorAsOf(cMid2))) ==
      asBands(mid.queryAll()))
    assert(asTotals(top.executer.queryAllAt(gTop2)) ==
      rollupBands(asBands(mid.queryAll())))
  }

  test("sync ledger durability: exact-hit cursorAsOf fails loudly on " +
      "half-applied generations, tolerates duplicate pairs and torn " +
      "tails, and stays bounded under unbounded polling") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.CdcConsumer
    val up = new Executer(PeopleCountByState,
      TestTmp.dir("graft-ledger-up"), cfg)
    up.execute(spark.createDataset(Seq(
      Person("p1", "AA"), Person("p2", "AB"), Person("p3", "BA"),
      Person("p4", "CC"))))
    val midStore = TestTmp.dir("graft-ledger-mid")
    val ledger = Paths.get(midStore, "_cdc_cursor_log")
    val mid = new CdcConsumer(up, StateBandCountsDelta, midStore, cfg,
      strict = true)
    mid.syncOnce()
    val (g1, c1) = mid.syncLog.last

    // Exact hit resolves; a generation BEFORE the retained history is
    // the documented −1; a generation past the last completed sync (or
    // between a sync's execute and delete) throws instead of returning
    // a plausible wrong cursor (ADVICE r12).
    assert(mid.cursorAsOf(g1) == c1)
    assert(mid.cursorAsOf(-1L) == -1L)
    intercept[IllegalArgumentException] { mid.cursorAsOf(g1 + 1000) }

    // A churn whose sync publishes TWO downstream generations (execute
    // for the changed keys, deleteDocuments for the vanished one — p4
    // was CC's only contributor): the ledger records only the sync
    // COMPLETION, and the half-applied generation between them throws.
    up.execute(spark.createDataset(Seq(Person("p4", "AA"))))
    mid.syncOnce()
    val (g2, c2) = mid.syncLog.last
    assert(g2 >= g1 + 2, "churn with a vanished key must publish " +
      "execute + delete generations for this test to bite")
    assert(mid.cursorAsOf(g2) == c2)
    intercept[IllegalArgumentException] { mid.cursorAsOf(g2 - 1) }

    // Duplicate pair (an at-least-once replay's signature): tolerated.
    Files.write(ledger, s"\n$g2 $c2".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    assert(mid.cursorAsOf(g2) == c2)

    // Torn tail (crash mid-append leaves a partial record, no trailing
    // newline): the next sync's newline-prefixed append isolates it —
    // the torn line loses only itself, prior rows and the new row parse.
    Files.write(ledger, "\n99".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    up.execute(spark.createDataset(Seq(Person("p5", "DD"))))
    mid.syncOnce()
    val log = mid.syncLog
    assert(log.take(2) == Seq((g1, c1), (g2, c2)))
    assert(!log.map(_._1).contains(99L), "torn tail must not parse")
    assert(log.last._1 > g2 && log.last._2 == up.snapshotVersion())

    // Boundedness (VERDICT r12 #5): plant months of poll history, then
    // one more sync — the write-side compaction caps the file and the
    // newest rows (the only ones manifest retention can still serve)
    // still resolve.
    val old = new String(Files.readAllBytes(ledger), "UTF-8")
    val fake = Array.fill(40000)("0 0\n").mkString
    Files.write(ledger, (fake + old.dropWhile(_ == '\n')).getBytes("UTF-8"))
    up.execute(spark.createDataset(Seq(Person("p6", "EE"))))
    mid.syncOnce()
    val (g4, c4) = mid.syncLog.last
    assert(Files.size(ledger) <= CdcConsumer.MaxLedgerBytes,
      "ledger must be compacted back under the threshold")
    assert(mid.syncLog.length == CdcConsumer.KeptLedgerRows)
    assert(mid.cursorAsOf(g4) == c4)
    assert(c4 == up.snapshotVersion())
    // And the downstream still equals the model after all of it.
    assert(bands(mid.executer) == model(up))
  }
}

/** Stage 3 of the pinning spec's chain: one grand-total row over the
  * band index's rows (doc id = the band — the chain contract). */
object GrandTotals extends MapReduceTask[BandPop, TotalPop] {
  def map(docs: Iterator[BandPop]): Iterator[(String, TotalPop)] =
    docs.map(b => (b.band, TotalPop("all", 1L, b.people)))
  def reduce(entries: Iterator[TotalPop]): Iterator[TotalPop] =
    entries.toSeq.groupBy(_.scope).map { case (sc, es) =>
      TotalPop(sc, es.map(_.bands).sum, es.map(_.people).sum)
    }.iterator
  def reduceKey(e: TotalPop): String = e.scope
  def documentId(d: BandPop): String = d.band
  override def singleOutput: Boolean = true
}

case class TotalPop(scope: String, bands: Long, people: Long)

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig, MapReduceTask}
import graft.streaming.JoinCdcConsumer

case class FactDoc(id: String, k: String, v: Long)
case class FactSum(k: String, n: Long, sum: Long)
case class DimDoc(k: String, tag: String)
case class DimTag(k: String, tag: String)
case class TagTotal(tag: String, nkeys: Long, sum: Long)

/** Left upstream: facts pre-aggregated to the join-key grain. */
object FactByKey extends MapReduceTask[FactDoc, FactSum] {
  def map(docs: Iterator[FactDoc]): Iterator[(String, FactSum)] =
    docs.map(d => (d.id, FactSum(d.k, 1L, d.v)))
  def reduce(entries: Iterator[FactSum]): Iterator[FactSum] =
    entries.toSeq.groupBy(_.k).map { case (k, es) =>
      FactSum(k, es.map(_.n).sum, es.map(_.sum).sum) }.iterator
  def reduceKey(e: FactSum): String = e.k
  override def singleOutput: Boolean = true
  def documentId(d: FactDoc): String = d.id
}

/** Right upstream: the dimension, one document per join key. */
object DimByKey extends MapReduceTask[DimDoc, DimTag] {
  def map(docs: Iterator[DimDoc]): Iterator[(String, DimTag)] =
    docs.map(d => (s"dim-${d.k}", DimTag(d.k, d.tag)))
  def reduce(entries: Iterator[DimTag]): Iterator[DimTag] =
    entries.toSeq.sortBy(_.tag).lastOption.iterator
  def reduceKey(e: DimTag): String = e.k
  override def singleOutput: Boolean = true
  def documentId(d: DimDoc): String = s"dim-${d.k}"
}

/** Downstream: the joined view rolled up by the dimension attribute. */
object JoinByTag extends MapReduceTask[(String, FactSum, DimTag), TagTotal] {
  def map(docs: Iterator[(String, FactSum, DimTag)]): Iterator[(String, TagTotal)] =
    docs.map { case (k, f, d) => (k, TagTotal(d.tag, 1L, f.sum)) }
  def reduce(entries: Iterator[TagTotal]): Iterator[TagTotal] =
    entries.toSeq.groupBy(_.tag).map { case (t, es) =>
      TagTotal(t, es.map(_.nkeys).sum, es.map(_.sum).sum) }.iterator
  def reduceKey(e: TagTotal): String = e.tag
  override def singleOutput: Boolean = true
  def documentId(d: (String, FactSum, DimTag)): String = d._1
}

/** [[JoinCdcConsumer]] protocol edges the q121 gate row does not pin:
  * inner-join appearance/disappearance as keys gain and lose sides,
  * no-op polls, pinned bootstrap, replay idempotence, and the
  * past-the-horizon resync fallback. */
class JoinCdcSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def facts(rows: (String, String, Long)*) =
    spark.createDataset(rows.map(r => FactDoc(r._1, r._2, r._3)))
  private def dims(rows: (String, String)*) =
    spark.createDataset(rows.map(r => DimDoc(r._1, r._2)))

  private def state(c: JoinCdcConsumer[FactSum, DimTag, TagTotal]) =
    c.queryAll().as[(String, String, Long, Long)].collect()
      .map { case (_, t, n, s) => t -> ((n, s)) }.toMap

  test("both-side churn, side loss, side gain — one poll each") {
    val l = new Executer(FactByKey, TestTmp.dir("graft-jcdc-l"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val r = new Executer(DimByKey, TestTmp.dir("graft-jcdc-r"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    l.execute(facts(("f1", "k1", 10L), ("f2", "k1", 5L), ("f3", "k2", 7L),
      ("f4", "k3", 1L)))
    r.execute(dims(("k1", "red"), ("k2", "blue")))
    val downDir = TestTmp.dir("graft-jcdc-d")
    val c = new JoinCdcConsumer(l, r, JoinByTag,
      downDir, ExecuterConfig(fanIn = 2, finalParts = 1),
      strict = true)
    c.syncOnce()
    // k3 has no dimension row: inner join drops it.
    assert(state(c) == Map("red" -> ((1L, 15L)), "blue" -> ((1L, 7L))))
    // Bootstrap health (the CdcConsumer doctrine): one full-snapshot
    // sync, churn sentinel −1, both sides caught up.
    val h0 = c.health
    assert(h0.resyncCount == 1L && h0.fallbackResyncCount == 0L &&
      h0.lastPollChurn == -1L && h0.leftLag == 0L && h0.rightLag == 0L,
      s"bootstrap health: $h0")

    // No upstream movement → poll is a cursor no-op, churn 0 (NOT the
    // stale bootstrap sentinel — the CdcConsumer no-op semantics).
    val cur = c.cursors
    assert(c.syncOnce() == cur)
    assert(c.health.lastPollChurn == 0L,
      s"no-op poll churn: ${c.health}")

    // LEFT churn: f2 re-submitted under k2 (k1 loses it, k2 gains it).
    l.execute(facts(("f2", "k2", 5L)))
    assert(c.health.leftLag == 1L && c.health.rightLag == 0L,
      s"one unapplied left generation: ${c.health}")
    c.syncOnce()
    assert(state(c) == Map("red" -> ((1L, 10L)), "blue" -> ((1L, 12L))))
    val h1 = c.health
    assert(h1.leftLag == 0L && h1.lastPollChurn == 2L &&
      h1.resyncCount == 1L, s"post-poll health (dirty = {k1,k2}): $h1")

    // RIGHT churn: k1 moves to blue; k3 GAINS a dimension row (the
    // previously dropped key must appear); k2's row is deleted (loses
    // its side → downstream delete).
    val (pl, pr) = c.cursors
    r.execute(dims(("k1", "blue"), ("k3", "green")))
    r.deleteDocuments(Seq("dim-k2"))
    c.syncOnce()
    assert(state(c) == Map("blue" -> ((1L, 10L)), "green" -> ((1L, 1L))))

    // INCREMENTAL replay: a crash between the downstream mutation and
    // the cursor write replays incrementalPoll from the OLD cursors —
    // simulate it by rewriting the pre-poll cursor pair and polling
    // again. The replayed batch (re-execute k1/k3, re-delete k2) must
    // converge: delete-and-reinsert per doc id + no-op deletes.
    val before = state(c)
    val cursorPath = java.nio.file.Paths.get(downDir, "_cdc_cursor2")
    java.nio.file.Files.write(cursorPath, s"$pl $pr".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    c.syncOnce()
    assert(state(c) == before, "incremental replay must converge")

    // BOOTSTRAP replay: losing the cursor file entirely forces a full
    // resync onto the already-synced store — at-least-once application
    // must converge there too (snapshot upsert + the stale sweep).
    java.nio.file.Files.delete(cursorPath)
    c.syncOnce()
    assert(state(c) == before, "bootstrap replay must converge")
  }

  test("pinned bootstrap reflects the named generations, later poll catches up") {
    val l = new Executer(FactByKey, TestTmp.dir("graft-jcdc2-l"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val r = new Executer(DimByKey, TestTmp.dir("graft-jcdc2-r"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    l.execute(facts(("f1", "k1", 3L)))
    r.execute(dims(("k1", "red")))
    val (vl, vr) = (l.snapshotVersion(), r.snapshotVersion())
    // Churn AFTER the pin: the bootstrap must not see it.
    l.execute(facts(("f1", "k1", 4L)))
    r.execute(dims(("k1", "blue")))
    val c = new JoinCdcConsumer(l, r, JoinByTag,
      TestTmp.dir("graft-jcdc2-d"), ExecuterConfig(fanIn = 2, finalParts = 1),
      strict = true)
    c.syncOnce(bootstrapAt = Some((vl, vr)))
    assert(state(c) == Map("red" -> ((1L, 3L))))
    c.syncOnce()
    assert(state(c) == Map("blue" -> ((1L, 4L))))
    // bootstrapAt after bootstrap is a contract error.
    intercept[IllegalArgumentException](
      c.syncOnce(bootstrapAt = Some((vl, vr))))
  }

  test("the sync ledger pins consistent three-store reads") {
    val l = new Executer(FactByKey, TestTmp.dir("graft-jcdc4-l"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val r = new Executer(DimByKey, TestTmp.dir("graft-jcdc4-r"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    l.execute(facts(("f1", "k1", 3L), ("f2", "k2", 9L)))
    r.execute(dims(("k1", "red"), ("k2", "blue")))
    val c = new JoinCdcConsumer(l, r, JoinByTag,
      TestTmp.dir("graft-jcdc4-d"), ExecuterConfig(fanIn = 2, finalParts = 1),
      strict = true)
    c.syncOnce()
    // Churn both sides, then one poll: execute + deleteDocuments
    // publishes MULTIPLE downstream generations, recording only the
    // completed sync's final one.
    l.execute(facts(("f1", "k1", 4L)))
    r.deleteDocuments(Seq("dim-k2"))
    c.syncOnce()

    val log = c.syncLog
    assert(log.size == 2, s"two completed syncs, got $log")
    val (g1, l1, r1) = log.head
    // The pinned three-store read: the downstream generation the first
    // sync published, beside the upstream generations it reflects —
    // the downstream pinned read must equal the join recomputed from
    // the pinned upstream snapshots (here: the pre-churn state).
    assert(c.cursorsAsOf(g1) == ((l1, r1)))
    val pinnedDown = c.executer.queryAllAt(g1)
      .collect().map(r0 => r0.getString(1) -> r0.getLong(3)).toMap
    assert(pinnedDown == Map("red" -> 3L, "blue" -> 9L),
      s"pinned downstream read drifted: $pinnedDown")
    val pinnedLeft = l.queryAllAt(l1)
      .collect().map(r0 => (r0.getString(1), r0.getLong(3))).toMap
    assert(pinnedLeft == Map("k1" -> 3L, "k2" -> 9L))
    // The final sync's row names the current heads; an intermediate
    // downstream generation between the two rows is a half-applied
    // sync batch — asking for its cursors must THROW, not return a
    // plausible wrong pin.
    val (g2, _, _) = log.last
    assert(g2 > g1 + 1, "the churn poll should publish >1 generation " +
      "(execute + delete) for this test to exercise the gap")
    intercept[IllegalArgumentException](c.cursorsAsOf(g1 + 1))
    // Below retained history: the sentinel, not a throw.
    assert(c.cursorsAsOf(g1 - 1) == ((-1L, -1L)))

    // Boundedness (VERDICT r12 #5, same contract as CdcConsumer's
    // ledger): plant months of poll history, then one more sync — the
    // write-side compaction caps the file and the newest rows still
    // resolve.
    val ledger = java.nio.file.Paths.get(
      c.executer.storePath, "_cdc_cursor2_log")
    val old = new String(java.nio.file.Files.readAllBytes(ledger), "UTF-8")
    val fake = Array.fill(30000)("0 0 0\n").mkString
    java.nio.file.Files.write(ledger,
      (fake + old.dropWhile(_ == '\n')).getBytes("UTF-8"))
    l.execute(facts(("f3", "k1", 7L)))
    c.syncOnce()
    val (g3, l3, r3) = c.syncLog.last
    assert(java.nio.file.Files.size(ledger) <=
      graft.streaming.CdcConsumer.MaxLedgerBytes,
      "join ledger must be compacted back under the threshold")
    assert(c.syncLog.length == graft.streaming.CdcConsumer.KeptLedgerRows)
    assert(c.cursorsAsOf(g3) == ((l3, r3)))
    assert(l3 == l.snapshotVersion() && r3 == r.snapshotVersion())
  }

  test("a cursor past either side's pruning horizon falls back to a full resync") {
    val l = new Executer(FactByKey, TestTmp.dir("graft-jcdc3-l"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val r = new Executer(DimByKey, TestTmp.dir("graft-jcdc3-r"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    l.execute(facts(("f1", "k1", 3L), ("f2", "k2", 9L)))
    r.execute(dims(("k1", "red"), ("k2", "blue")))
    val c = new JoinCdcConsumer(l, r, JoinByTag,
      TestTmp.dir("graft-jcdc3-d"), ExecuterConfig(fanIn = 2, finalParts = 1))
    c.syncOnce()
    // Churn the left side several generations, then compact it — the
    // consumer's left cursor is now behind the pruning horizon, so the
    // next poll must converge via the snapshot path (including the
    // stale sweep for k2, whose dimension row also vanishes below).
    l.execute(facts(("f1", "k1", 4L)))
    l.execute(facts(("f1", "k1", 5L)))
    l.compact(maxFilesPerPartition = 1)
    r.deleteDocuments(Seq("dim-k2"))
    c.syncOnce()
    assert(state(c) == Map("red" -> ((1L, 5L))))
  }

  test("attach runs the join protocol as a continuous micro-batch job") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val l = new Executer(FactByKey, TestTmp.dir("graft-jcdc5-l"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val r = new Executer(DimByKey, TestTmp.dir("graft-jcdc5-r"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    l.execute(facts(("f1", "k1", 3L), ("f2", "k2", 9L)))
    r.execute(dims(("k1", "red"), ("k2", "blue")))
    val c = new JoinCdcConsumer(l, r, JoinByTag,
      TestTmp.dir("graft-jcdc5-d"), ExecuterConfig(fanIn = 2, finalParts = 1),
      strict = true)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ticks = MemoryStream[Int]
    // ProcessingTime(0), not AvailableNow — the long-lived poll loop
    // (the StreamingCdcSpec doctrine).
    val q = c.attach(ticks.toDS(), TestTmp.dir("graft-jcdc5-ckpt"),
      trigger = Trigger.ProcessingTime(0))
    def poll(): Unit = { ticks.addData(1); q.processAllAvailable() }
    try {
      poll() // bootstrap through the streaming wrapper
      assert(state(c) == Map("red" -> ((1L, 3L)), "blue" -> ((1L, 9L))))
      assert(c.health.resyncCount == 1L)
      // Both-side churn between ticks; the next tick's ONE poll
      // absorbs both feeds.
      l.execute(facts(("f1", "k1", 4L)))
      r.execute(dims(("k2", "green")))
      poll()
      assert(state(c) == Map("red" -> ((1L, 4L)), "green" -> ((1L, 9L))))
      val h = c.health
      assert(h.resyncCount == 1L && h.lastPollChurn == 2L &&
        h.leftLag == 0L && h.rightLag == 0L,
        s"streamed incremental poll health: $h")
    } finally q.stop()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig, MapReduceTask}

case class Person(id: String, state: String)
case class StatePop(state: String, count: Long)

/** The reference's sample task: COUNT(*) GROUP BY state
  * (`MapReduce/PeopleCountByState.cs`). */
object PeopleCountByState extends MapReduceTask[Person, StatePop] {
  def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
    docs.map(p => (p.id, StatePop(p.state, 1L)))
  def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
    entries.toSeq.groupBy(_.state)
      .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
  def reduceKey(e: StatePop): String = e.state
  def documentId(p: Person): String = p.id
}

class ExecuterSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    TestTmp.dir("graft-exec")

  private def counts(ex: Executer[Person, StatePop]): Map[String, Long] =
    ex.queryAll().as[(String, String, Long)].collect()
      .map { case (_, s, c) => s -> c }.toMap

  /** Golden end-to-end — the reference's own acceptance scenario
    * (`MapReduce/Program.cs:26-44`): 397 CA + 256 TX, query, move
    * `people-30` CA→TX, total invariant. */
  test("golden: build, query, incremental single-doc update") {
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store)
    val people =
      (1 to 397).map(i => Person(s"people-$i", "CA")) ++
      (398 to 653).map(i => Person(s"people-$i", "TX"))
    ex.execute(spark.createDataset(people))

    assert(ex.query("CA").collect().toSeq == Seq(StatePop("CA", 397L)))
    assert(ex.query("TX").collect().toSeq == Seq(StatePop("TX", 256L)))
    assert(counts(ex).values.sum == 653L)

    // Update: re-submit people-30 with state=TX (Program.cs:35-39).
    ex.execute(spark.createDataset(Seq(Person("people-30", "TX"))))
    assert(ex.query("CA").collect().toSeq == Seq(StatePop("CA", 396L)))
    assert(ex.query("TX").collect().toSeq == Seq(StatePop("TX", 257L)))
    assert(counts(ex).values.sum == 653L)

    // Missing key yields empty, not an error (Executer.cs:373-375).
    assert(ex.query("ZZ").collect().isEmpty)
  }

  /** Document ids are case-insensitive (`Executer.cs:246-247,302`):
    * re-submitting "PEOPLE-30" must replace "people-30". */
  test("case-insensitive document ids") {
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(
      Person("people-1", "CA"), Person("people-2", "TX"))))
    ex.execute(spark.createDataset(Seq(Person("PEOPLE-1", "TX"))))
    assert(counts(ex) == Map("TX" -> 2L))
    assert(ex.query("CA").collect().isEmpty)
  }

  /** Update idempotence: re-submitting an identical doc changes nothing
    * (SURVEY.md §5.2). */
  test("update idempotence") {
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(
      Person("a", "CA"), Person("b", "CA"), Person("c", "NY"))))
    val before = counts(ex)
    ex.execute(spark.createDataset(Seq(Person("a", "CA"))))
    assert(counts(ex) == before)
  }

  /** Incremental ≡ batch: a random sequence of inserts and re-submissions
    * applied incrementally must equal a single full recompute of the final
    * document state (SURVEY.md §5.2). Deterministic seed. */
  test("incremental equals batch under random updates") {
    val rnd = new scala.util.Random(42)
    val states = Array("CA", "TX", "NY", "WA", "OR")
    val ids = (1 to 120).map(i => s"doc-$i")

    val batches = (1 to 6).map { _ =>
      (1 to 40).map { _ =>
        Person(ids(rnd.nextInt(ids.length)), states(rnd.nextInt(states.length)))
      }
    }
    // Within one batch the reference keeps the LAST occurrence of a doc id
    // winning is not defined — feed deduped batches (last wins) to both.
    val dedupedBatches = batches.map(_.groupBy(_.id.toUpperCase).map(_._2.last).toSeq)

    val incEx = new Executer(PeopleCountByState, tmp())
    dedupedBatches.foreach(b => incEx.execute(spark.createDataset(b)))

    val finalState = dedupedBatches.flatten
      .groupBy(_.id.toUpperCase).map(_._2.last).toSeq
    val batchEx = new Executer(PeopleCountByState, tmp())
    batchEx.execute(spark.createDataset(finalState))

    assert(counts(incEx) == counts(batchEx))
    assert(counts(incEx).values.sum == finalState.size.toLong)
  }

  /** Multi-output reduce (R* => R*) and multi-key maps work; a doc that
    * remaps to a different key disappears from the old key entirely. */
  test("small tree config exercises multi-parent paths") {
    // Tiny fan-in so multiple parents/buckets are hit even with few docs.
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store, ExecuterConfig(fanIn = 4, finalParts = 4))
    val people = (1 to 50).map(i => Person(s"p-$i", if (i % 2 == 0) "CA" else "TX"))
    ex.execute(spark.createDataset(people))
    assert(counts(ex) == Map("CA" -> 25L, "TX" -> 25L))
    ex.execute(spark.createDataset(Seq(Person("p-2", "TX"))))
    assert(counts(ex) == Map("CA" -> 24L, "TX" -> 26L))
  }

  /** Pure-insert batches (no incoming id previously seen) take the
    * append fast path — no partition rewrite; results must still be
    * exactly maintained, and a following mixed batch must still
    * invalidate correctly. */
  test("pure-insert append path, then mixed insert+update") {
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(Person("a", "CA"), Person("b", "TX"))))
    ex.execute(spark.createDataset(Seq(Person("c", "CA"), Person("d", "NY"))))
    assert(counts(ex) == Map("CA" -> 2L, "TX" -> 1L, "NY" -> 1L))
    ex.execute(spark.createDataset(Seq(Person("a", "TX"), Person("e", "NY"))))
    assert(counts(ex) == Map("CA" -> 1L, "TX" -> 2L, "NY" -> 2L))
  }

  /** A re-submitted doc whose map now emits ZERO entries must still
    * invalidate its previous contribution (`Executer.cs:89-91`:
    * incoming ids come from documentId over the documents, not from map
    * output) — through the tombstone path like any other update. */
  test("doc remapped to zero entries invalidates its old contribution") {
    object Gated extends MapReduceTask[Person, StatePop] {
      def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
        docs.filter(_.state != "SKIP").map(p => (p.id, StatePop(p.state, 1L)))
      def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
        entries.toSeq.groupBy(_.state)
          .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
      def reduceKey(e: StatePop): String = e.state
      def documentId(p: Person): String = p.id
    }
    val ex = new Executer(Gated, tmp())
    ex.execute(spark.createDataset(Seq(
      Person("a", "CA"), Person("b", "CA"), Person("c", "TX"))))
    ex.execute(spark.createDataset(Seq(Person("a", "SKIP"))))
    assert(counts(ex) == Map("CA" -> 1L, "TX" -> 1L))
    // And it can come back.
    ex.execute(spark.createDataset(Seq(Person("a", "TX"))))
    assert(counts(ex) == Map("CA" -> 1L, "TX" -> 2L))
  }

  test("empty update batch is a no-op") {
    val ex = new Executer(PeopleCountByState, tmp())
    ex.execute(spark.createDataset(Seq(Person("a", "CA"))))
    val before = counts(ex)
    ex.execute(spark.emptyDataset[Person])
    assert(counts(ex) == before)
    assert(ex.isClean)
  }

  /** The bucket layout is baked into stored data — re-opening with a
    * different (fanIn, finalParts) must fail fast, not silently
    * mis-route updates and mis-prune lookups. */
  test("opening a store with a mismatched layout config fails fast") {
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 8, finalParts = 4))
    ex.execute(spark.createDataset(Seq(Person("a", "CA"))))
    val wrong = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 16, finalParts = 4))
    val e = intercept[IllegalArgumentException] {
      wrong.execute(spark.createDataset(Seq(Person("b", "TX"))))
    }
    assert(e.getMessage.contains("fanIn=8"))
    // The right config still works, including from a fresh instance.
    val again = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 8, finalParts = 4))
    again.execute(spark.createDataset(Seq(Person("b", "TX"))))
    assert(counts(again) == Map("CA" -> 1L, "TX" -> 1L))
  }

  test("delete drops all state for a key") {
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(
      Person("a", "CA"), Person("b", "TX"))))
    ex.delete("CA")
    assert(ex.query("CA").collect().isEmpty)
    assert(counts(ex) == Map("TX" -> 1L))
  }

  /** The singleOutput fast path (native Aggregator with map-side combine)
    * must be semantically identical to the general flatMapGroups path
    * across build, incremental update, remap-away, and delete. */
  test("singleOutput aggregator path matches the general path") {
    object Fast extends MapReduceTask[Person, StatePop] {
      def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
        docs.map(p => (p.id, StatePop(p.state, 1L)))
      def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
        entries.toSeq.groupBy(_.state)
          .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
      def reduceKey(e: StatePop): String = e.state
      def documentId(p: Person): String = p.id
      override def singleOutput: Boolean = true
    }
    val people = (1 to 80).map(i =>
      Person(s"p-$i", if (i % 3 == 0) "CA" else if (i % 3 == 1) "TX" else "NY"))
    val fast = new Executer(Fast, tmp(), ExecuterConfig(fanIn = 4, finalParts = 4))
    val slow = new Executer(PeopleCountByState, tmp(),
      ExecuterConfig(fanIn = 4, finalParts = 4))
    Seq[Executer[Person, StatePop]](fast, slow).foreach { ex =>
      ex.execute(spark.createDataset(people))
      ex.execute(spark.createDataset(Seq(Person("p-3", "TX"), Person("new-1", "NY"))))
      ex.delete("TX")
    }
    assert(counts(fast) == counts(slow))
    assert(counts(fast)("NY") > 0)
  }

  test("a batch with two versions of one document is rejected loudly") {
    // Tombstones only invalidate seq < batchSeq, so intra-batch
    // duplicates would BOTH survive and silently double-count forever;
    // the contract is one version per doc per batch (ids are
    // case-insensitive, so 'x'/'X' collide too).
    val store = tmp()
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(Person("a", "CA"), Person("b", "TX"))))
    val before = counts(ex)
    // Local (driver-collected) batch shape.
    intercept[IllegalArgumentException] {
      ex.execute(spark.createDataset(Seq(Person("x", "CA"), Person("X", "TX"))))
    }
    // Distributed batch shape: detection rides the ids-probe job.
    intercept[IllegalArgumentException] {
      ex.execute(spark.createDataset(
        Seq(Person("y", "CA"), Person("y", "TX"))).repartition(2))
    }
    // Rejection happened before any mutation: state unchanged, clean.
    assert(counts(ex) == before)
    assert(ex.isClean)
    ex.execute(spark.createDataset(Seq(Person("x", "CA"))))
    assert(counts(ex)("CA") == 2L)
  }

  test("a concurrent same-instance reader never sees the half-applied batch") {
    // The writer thread's reads resolve the in-progress pending
    // generation (it must see its own merges); every OTHER thread on
    // the same instance must keep resolving the last PUBLISHED
    // generation until the batch lands. The slow task blocks inside
    // reduce — by then tombstones and the map append are in flight.
    val store = tmp()
    val warm = new Executer(SlowReduceTask.Plain, store)
    warm.execute(spark.createDataset(Seq(Person("a", "CA"), Person("b", "TX"))))

    val ex = new Executer(SlowReduceTask, store)
    SlowReduceTask.arm()
    @volatile var failure: Throwable = null
    val writer = new Thread(() => {
      try ex.execute(spark.createDataset(Seq(Person("a", "TX"))))
      catch { case t: Throwable => failure = t }
    }, "graft-slow-writer")
    writer.start()
    assert(SlowReduceTask.entered.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "writer never reached the blocked reduce")
    // Mid-batch read from this (non-writer) thread: the OLD generation.
    val mid = ex.queryAll().as[(String, String, Long)].collect()
      .map { case (_, s, c) => s -> c }.toMap
    assert(mid == Map("CA" -> 1L, "TX" -> 1L),
      s"reader observed half-applied state: $mid")
    SlowReduceTask.release()
    writer.join(120000)
    assert(failure == null, s"writer failed: $failure")
    val after = ex.queryAll().as[(String, String, Long)].collect()
      .map { case (_, s, c) => s -> c }.toMap
    assert(after == Map("TX" -> 2L), s"batch did not land: $after")
  }
}

/** PeopleCountByState whose reduce blocks on a latch when armed —
  * static state so the closure works across Spark task threads in
  * local mode. */
object SlowReduceTask extends MapReduceTask[Person, StatePop] {
  @volatile private var armed = false
  val entered = new java.util.concurrent.CountDownLatch(1)
  private val gate = new java.util.concurrent.CountDownLatch(1)
  def arm(): Unit = armed = true
  def release(): Unit = { armed = false; gate.countDown() }

  /** Same semantics without the latch, for building the base store.
    * Shares [[SlowReduceTask]]'s persisted identity — the two classes
    * ARE the same task semantically, and the store guard
    * ([[MapReduceTask.taskId]]) would otherwise (correctly) refuse the
    * cross-class reopen; this is the designed remedy. */
  object Plain extends MapReduceTask[Person, StatePop] {
    def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
      SlowReduceTask.this.map(docs)
    def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
      entries.toSeq.groupBy(_.state)
        .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
    def reduceKey(e: StatePop): String = e.state
    def documentId(p: Person): String = p.id
    override def taskId: String = SlowReduceTask.taskId
  }

  def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
    docs.map(p => (p.id, StatePop(p.state, 1L)))
  def reduce(entries: Iterator[StatePop]): Iterator[StatePop] = {
    if (armed) {
      entered.countDown()
      gate.await(90, java.util.concurrent.TimeUnit.SECONDS)
    }
    entries.toSeq.groupBy(_.state)
      .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
  }
  def reduceKey(e: StatePop): String = e.state
  def documentId(p: Person): String = p.id
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig, MapReduceTask}
import graft.ops.IncrementalIndexes.{DocText, KgramFreqIndex}

/** A semantically DIFFERENT named task over the same row types — what a
  * production mixup looks like: someone points the wrong job at an
  * existing store. */
object PeopleCountByStateUpper extends MapReduceTask[Person, StatePop] {
  def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
    docs.map(p => (p.id, StatePop(p.state.toUpperCase, 1L)))
  def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
    entries.toSeq.groupBy(_.state)
      .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
  def reduceKey(e: StatePop): String = e.state
  def documentId(p: Person): String = p.id
}

/** The task-identity guard (round 15): a store's map rows and reduce
  * tree are meaningful only under the task that wrote them, so `_config`
  * carries [[MapReduceTask.taskId]] from first build and every later
  * open validates it — opening with a different NAMED task fails loudly
  * instead of silently mixing two tasks' outputs in one index.
  * Anonymous tasks (no stable identity across recompiles) and legacy
  * 2-int `_config` stores are accepted as-is. */
class TaskIdGuardSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def people = spark.createDataset(Seq(
    Person("p-1", "CA"), Person("p-2", "CA"), Person("p-3", "TX")))

  test("same named task reopens and reads; different named task is rejected") {
    val store = TestTmp.dir("graft-taskid")
    new Executer(PeopleCountByState, store).execute(people)
    // Same task, fresh instance: fine.
    val again = new Executer(PeopleCountByState, store)
    assert(again.query("CA").collect().head.count == 2L)
    // Different named task: loud refusal naming both ids, on the READ
    // path too (before any mutation can land).
    val e = intercept[IllegalArgumentException] {
      new Executer(PeopleCountByStateUpper, store).query("CA").collect()
    }
    assert(e.getMessage.contains("PeopleCountByState"))
    assert(e.getMessage.contains("PeopleCountByStateUpper"))
    // ...and on the update path.
    intercept[IllegalArgumentException] {
      new Executer(PeopleCountByStateUpper, store).execute(people)
    }
  }

  test("anonymous tasks are recorded but never enforced") {
    // TWO definition sites → two distinct $$anon$ class names; a single
    // helper called twice would share one class and pass trivially via
    // sid == cur without ever exercising the exemption.
    val anonA = new MapReduceTask[Person, StatePop] {
      def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
        docs.map(p => (p.id, StatePop(p.state, 1L)))
      def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
        entries.toSeq.groupBy(_.state)
          .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
      def reduceKey(e: StatePop): String = e.state
      def documentId(p: Person): String = p.id
    }
    val anonB = new MapReduceTask[Person, StatePop] {
      def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
        docs.map(p => (p.id, StatePop(p.state, 1L)))
      def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
        entries.toSeq.groupBy(_.state)
          .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
      def reduceKey(e: StatePop): String = e.state
      def documentId(p: Person): String = p.id
    }
    assert(anonA.taskId != anonB.taskId,
      "fixture must produce two distinct anonymous class names")
    val store = TestTmp.dir("graft-taskid-anon")
    new Executer(anonA, store).execute(people)
    // A DIFFERENT anonymous class (stored-side exemption) — and a NAMED
    // task over an anon-built store — both open.
    assert(new Executer(anonB, store).queryAll().count() == 2L)
    assert(new Executer(PeopleCountByState, store).queryAll().count() == 2L)
    // cur-side exemption: an anonymous task opens a NAMED-built store.
    val namedStore = TestTmp.dir("graft-taskid-named")
    new Executer(PeopleCountByState, namedStore).execute(people)
    assert(new Executer(anonA, namedStore).queryAll().count() == 2L)
  }

  test("legacy 2-int _config stores are accepted by any task") {
    val store = TestTmp.dir("graft-taskid-legacy")
    new Executer(PeopleCountByState, store).execute(people)
    // Rewrite _config in the pre-r15 format: layout only, no id.
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(s"$store/_config"))
    try { out.writeInt(ExecuterConfig().fanIn)
      out.writeInt(ExecuterConfig().finalParts) } finally out.close()
    assert(new Executer(PeopleCountByStateUpper, store)
      .queryAll().count() == 2L)
  }

  test("parameterized task folds its parameter into the identity") {
    val store = TestTmp.dir("graft-taskid-kgram")
    val docs = spark.createDataset(Seq(
      DocText(1L, "a b c d e"), DocText(2L, "c d e f g")))
    new Executer(new KgramFreqIndex(3), store).execute(docs)
    // Same k reopens; a different k is a different shingle universe.
    assert(new Executer(new KgramFreqIndex(3), store).queryAll().count() > 0)
    val e = intercept[IllegalArgumentException] {
      new Executer(new KgramFreqIndex(5), store).queryAll().count()
    }
    assert(e.getMessage.contains("k=3") && e.getMessage.contains("k=5"))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Executer

/** Crash-safety semantics (SURVEY.md §2.3.4, invalidate-before-compute):
  * the dirty-set WAL is written before state mutation; `recover()`
  * re-runs the re-reduce for a surviving dirty log, and re-reducing is
  * idempotent (level-1 parents rebuild from scratch).
  */
class RecoverySpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("recover() is a no-op on a clean store") {
    val store = Files.createTempDirectory("graft-rec").toString
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(Person("a", "CA"), Person("b", "TX"))))
    val before = ex.queryAll().collect().toSet
    ex.recover()
    assert(ex.queryAll().collect().toSet == before)
  }

  test("recover() after a simulated crash between WAL write and reduce") {
    val store = Files.createTempDirectory("graft-rec2").toString
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(
      Person("a", "CA"), Person("b", "CA"), Person("c", "TX"))))

    // Simulate an interrupted execute: a dirty log naming every (key,
    // parent) pair survives on disk (conservative over-marking is legal).
    spark.read.parquet(s"$store/map_results")
      .select("reduce_key", "parent").distinct()
      .write.mode("overwrite").parquet(s"$store/dirty")

    ex.recover()
    assert(ex.query("CA").collect().toSeq == Seq(StatePop("CA", 2L)))
    assert(ex.query("TX").collect().toSeq == Seq(StatePop("TX", 1L)))
    // WAL consumed.
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$store/dirty")))
  }

  test("recover() after a crash mid-initial-build replays the full rebuild") {
    val store = Files.createTempDirectory("graft-rec3").toString
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(
      Person("a", "CA"), Person("b", "CA"), Person("c", "TX"))))

    // Simulate a crash between the map write and the reduce of an initial
    // build: map_results exists, the reduce tree does not, and the
    // driver-local WAL holds the full-rebuild sentinel.
    val fsPath = java.nio.file.Paths.get(store)
    org.apache.commons.io.FileUtils.deleteDirectory(
      fsPath.resolve("reduce_tree").toFile)
    val out = new java.io.DataOutputStream(
      java.nio.file.Files.newOutputStream(fsPath.resolve("dirty.pairs")))
    out.writeInt(1); out.writeUTF(""); out.writeInt(-1); out.close()

    assert(!ex.isClean)
    ex.recover()
    assert(ex.isClean)
    assert(ex.query("CA").collect().toSeq == Seq(StatePop("CA", 2L)))
    assert(ex.query("TX").collect().toSeq == Seq(StatePop("TX", 1L)))
  }
}

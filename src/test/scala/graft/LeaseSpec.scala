package graft

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec

import graft.GoldenDemo.{PeopleCountByState, Person}
import graft.core.Executer

/** Single-writer lease: concurrent maintenance on one store must be
  * refused (the reference is single-process by construction,
  * `MapReduce/Program.cs:13-45`; two interleaved staging swaps would
  * corrupt state), the lease must not outlive a successful batch, and a
  * crashed writer's lease must be breakable after recovery.
  */
class LeaseSpec extends AnyFunSpec {
  private implicit val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  it("refuses a second writer, releases on completion, and is breakable") {
    val store = Files.createTempDirectory("graft-lease").toString
    val ex = new Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(Seq(Person("p-1", "CA"), Person("p-2", "TX"))))

    val lease = new java.io.File(s"$store/_writer.lease")
    assert(!lease.exists(), "lease must be released after a completed batch")
    assert(ex.isClean && ex.pendingDirtyPairs() == 0)

    // Simulate a concurrent (or crashed) writer holding the lease.
    assert(lease.createNewFile())
    val err = intercept[IllegalStateException] {
      ex.execute(spark.createDataset(Seq(Person("p-3", "CA"))))
    }
    assert(err.getMessage.contains("lease"))

    // Operator breaks the stale lease; maintenance proceeds again.
    ex.breakLease()
    ex.execute(spark.createDataset(Seq(Person("p-3", "CA"))))
    assert(ex.query("CA").collect().map(_.count).sum == 2)
    assert(!lease.exists())
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingExecuter

class StreamingExecuterSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("micro-batches incrementally maintain the persistent index") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val store = Files.createTempDirectory("graft-stream-store").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    // Batch 1: initial documents land in the source directory.
    spark.createDataset(Seq(
      Person("p-1", "CA"), Person("p-2", "CA"), Person("p-3", "TX")))
      .write.mode("append").parquet(in)

    val sx = new StreamingExecuter(PeopleCountByState, store)
    def drain(): Unit = {
      val docs = spark.readStream
        .schema("id STRING, state STRING")
        .parquet(in).as[Person]
      val q = sx.attach(docs, ckpt)
      q.awaitTermination()
    }
    drain()
    assert(sx.query("CA").collect().toSeq == Seq(StatePop("CA", 2L)))
    assert(sx.query("TX").collect().toSeq == Seq(StatePop("TX", 1L)))

    // Batch 2: an update re-submits p-2 as TX; only the new file is
    // processed (checkpointed source), and the index updates in place.
    spark.createDataset(Seq(Person("p-2", "TX")))
      .write.mode("append").parquet(in)
    drain()
    assert(sx.query("CA").collect().toSeq == Seq(StatePop("CA", 1L)))
    assert(sx.query("TX").collect().toSeq == Seq(StatePop("TX", 2L)))
  }
}

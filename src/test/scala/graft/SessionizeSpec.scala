package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funspec.AnyFunSpec

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, Session}

/** Sessionization semantics under streaming execution: sessions split on
  * gaps, close when the watermark passes end + gap, and survive
  * micro-batch boundaries (state carried by flatMapGroupsWithState).
  */
class SessionizeSpec extends AnyFunSpec {
  private implicit val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  it("emits gap-separated sessions once the watermark passes them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Sessionize.sessions(input.toDS(), gapMs = 30000L, watermark = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // Batch 1: alice has two events 10s apart (one session), bob one.
      input.addData(Ev("alice", ts(100)), Ev("alice", ts(110)), Ev("bob", ts(105)))
      q.processAllAvailable()
      // Batch 2: far-future event advances the watermark beyond
      // everyone's (end + gap), closing both open sessions; carol's own
      // session stays open.
      input.addData(Ev("carol", ts(1000)))
      q.processAllAvailable()
      // One more empty-ish advance so timeout firings are delivered.
      input.addData(Ev("carol", ts(1001)))
      q.processAllAvailable()

      val sessions = spark.table("sessions_out").as[Session].collect()
        .map(s => (s.user, s.start.getTime / 1000, s.end.getTime / 1000, s.events))
        .toSet
      assert(sessions.contains(("alice", 100L, 110L, 2)))
      assert(sessions.contains(("bob", 105L, 105L, 1)))
      assert(!sessions.exists(_._1 == "carol"), "carol's session is still open")
    } finally q.stop()
  }

  it("splits a single batch spanning a gap into separate sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Sessionize.sessions(input.toDS(), gapMs = 30000L, watermark = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_out2")
      .outputMode("append").start()
    try {
      input.addData(Ev("dave", ts(100)), Ev("dave", ts(200)), Ev("dave", ts(210)))
      q.processAllAvailable()
      input.addData(Ev("erin", ts(2000)))
      q.processAllAvailable()
      input.addData(Ev("erin", ts(2001)))
      q.processAllAvailable()

      val sessions = spark.table("sessions_out2").as[Session].collect()
        .filter(_.user == "dave")
        .map(s => (s.start.getTime / 1000, s.end.getTime / 1000, s.events)).toSet
      assert(sessions == Set((100L, 100L, 1), (200L, 210L, 2)))
    } finally q.stop()
  }
}

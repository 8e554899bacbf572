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

  it("streaming sessions equal the batch gaps-and-islands construction") {
    // The same session definition exists twice — flatMapGroupsWithState
    // (streaming) and q61's window construction (batch). They must
    // agree on identical input: sessions are a property of the data,
    // not of the execution mode.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val evs = (for (u <- Seq("u1", "u2", "u3"); _ <- 1 to 30)
      yield Ev(u, ts(rnd.nextInt(3000)))).sortBy(_.ts.getTime)

    // Batch truth: the q61 construction with a 30s gap.
    val w = Window.partitionBy($"user").orderBy($"ts")
    val want = evs.toDF("user", "ts")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_sess", when($"prev_ts".isNull ||
        $"ts".cast("long") - $"prev_ts".cast("long") > 30, 1).otherwise(0))
      .withColumn("sess_no", sum($"new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user", $"sess_no")
      .agg(min($"ts") as "start", max($"ts") as "end", count(lit(1)) as "n")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(2).getTime / 1000,
        r.getTimestamp(3).getTime / 1000, r.getLong(4).toInt)).toSet

    // Streaming: chronological halves (no late data), then a sentinel
    // user far in the future to close every real session.
    val input = MemoryStream[Ev]
    val out = Sessionize.sessions(input.toDS(), gapMs = 30000L, watermark = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_eq")
      .outputMode("append").start()
    try {
      val (h1, h2) = evs.splitAt(evs.size / 2)
      input.addData(h1); q.processAllAvailable()
      input.addData(h2); q.processAllAvailable()
      input.addData(Ev("zz", ts(100000))); q.processAllAvailable()
      input.addData(Ev("zz", ts(100001))); q.processAllAvailable()
      val got = spark.table("sessions_eq").as[Session].collect()
        .filter(_.user != "zz")
        .map(s => (s.user, s.start.getTime / 1000, s.end.getTime / 1000, s.events))
        .toSet
      assert(got == want, s"streaming=${got.size} batch=${want.size} sessions")
    } finally q.stop()
  }

  it("an on-time out-of-order event extends the right session, never the open one") {
    // gap 5s, watermark 10s: an event can be on time (>= watermark) yet
    // older than the newest open session. It must join the session
    // whose interval it falls in — and a session must never be emitted
    // before the watermark seals it, or the event would have nowhere
    // correct to go (the two coupled bugs this pins the fix for).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Sessionize.sessions(input.toDS(), gapMs = 5000L, watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      // Two gap-separated spans; watermark after this batch = 100s.
      input.addData(Ev("alice", ts(100)), Ev("alice", ts(110)))
      q.processAllAvailable()
      // On-time (103 >= 100) but older than the open 110-session: joins
      // the 100-span (|103-100| <= 5), NOT the 110-span (gap 7 > 5).
      input.addData(Ev("alice", ts(103)))
      q.processAllAvailable()
      input.addData(Ev("zz", ts(1000))); q.processAllAvailable()
      input.addData(Ev("zz", ts(1001))); q.processAllAvailable()
      val sessions = spark.table("sessions_ooo").as[Session].collect()
        .filter(_.user == "alice")
        .map(s => (s.start.getTime / 1000, s.end.getTime / 1000, s.events)).toSet
      assert(sessions == Set((100L, 103L, 2), (110L, 110L, 1)),
        s"out-of-order event misattributed: $sessions")
    } finally q.stop()
  }

  it("an out-of-order event bridging two unsealed sessions merges them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Sessionize.sessions(input.toDS(), gapMs = 5000L, watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_bridge")
      .outputMode("append").start()
    try {
      input.addData(Ev("bob", ts(100)), Ev("bob", ts(110)))
      q.processAllAvailable()
      // 105 is within gap of BOTH spans: one merged session results.
      input.addData(Ev("bob", ts(105)))
      q.processAllAvailable()
      input.addData(Ev("zz", ts(1000))); q.processAllAvailable()
      input.addData(Ev("zz", ts(1001))); q.processAllAvailable()
      val sessions = spark.table("sessions_bridge").as[Session].collect()
        .filter(_.user == "bob")
        .map(s => (s.start.getTime / 1000, s.end.getTime / 1000, s.events)).toSet
      assert(sessions == Set((100L, 110L, 3)), s"bridge merge failed: $sessions")
    } finally q.stop()
  }

  it("a span whose close time EQUALS the watermark is not sealed yet (ADVICE r6)") {
    // Seal must be STRICT (end + gap < wm), consistent with the
    // inclusive merge rule: the former inclusive seal emitted a span
    // the instant wm reached its close time. (The full ADVICE scenario
    // — an on-time event arriving at exactly t == end+gap == wm — is
    // unreachable under Spark's own pre-operator late filtering, which
    // drops rows at t == wm before flatMapGroupsWithState sees them;
    // the strict seal's observable is therefore emission TIMING, and
    // it also keeps the operator correct if that filter ever loosens.)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Sessionize.sessions(input.toDS(), gapMs = 30000L, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_boundary")
      .outputMode("append").start()
    try {
      input.addData(Ev("alice", ts(100)))   // span [100,100], closes at 130
      q.processAllAvailable()
      input.addData(Ev("bob", ts(130)))     // wm -> 130 after this batch
      q.processAllAvailable()
      input.addData(Ev("bob", ts(130)))     // a batch AT wm == alice's close time
      q.processAllAvailable()
      // Strict seal: end + gap == wm must NOT have emitted alice.
      assert(spark.table("sessions_boundary").as[Session].collect().isEmpty,
        "nothing may seal while wm has only REACHED the close time")
      input.addData(Ev("carol", ts(1000)))  // wm strictly past every close time
      q.processAllAvailable()
      input.addData(Ev("carol", ts(1001)))  // deliver timeout firings
      q.processAllAvailable()
      val got = spark.table("sessions_boundary").as[Session].collect()
        .map(s => (s.user, s.start.getTime / 1000, s.end.getTime / 1000, s.events))
        .toSet
      assert(got.contains(("alice", 100L, 100L, 1)))
      assert(got.contains(("bob", 130L, 130L, 1)))
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

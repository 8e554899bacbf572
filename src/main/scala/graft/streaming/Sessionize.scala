package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization over a stream — the custom-state streaming
  * operator family (`flatMapGroupsWithState`) the engine exposes beyond
  * windowed aggregation: per-key mutable state with an event-time
  * timeout, the building block for user-session analytics over the
  * `events` stream at any scale (state is partitioned by key and bounded
  * by the number of LIVE sessions, not by history).
  *
  * A session is a maximal run of events per user with gaps below
  * `gapMs`; it is emitted once the watermark passes its close time
  * (append-mode semantics — late events beyond the watermark are
  * dropped, exactly like the windowed aggregation path).
  */
object Sessionize {

  case class Ev(user: String, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Int)
  case class Session(user: String, start: Timestamp, end: Timestamp, events: Int)

  def sessions(
      events: Dataset[Ev],
      gapMs: Long,
      watermark: String = "10 seconds"): Dataset[Session] = {
    implicit val encState = Encoders.product[SessionState]
    implicit val encOut = Encoders.product[Session]
    implicit val encStr = Encoders.STRING
    implicit val encTup = Encoders.tuple(Encoders.STRING, encOut)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed (session end + gap): the session is final.
            val s = state.get
            state.remove()
            Iterator.single(
              Session(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            // Fold the batch's events into the open session. Events are
            // processed as a set: a batch that spans a gap still forms
            // one session per contiguous run.
            val ts = evs.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}

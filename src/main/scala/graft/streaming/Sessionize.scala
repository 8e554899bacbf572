package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization over a stream — the custom-state streaming
  * operator family (`flatMapGroupsWithState`) the engine exposes beyond
  * windowed aggregation: per-key mutable state with an event-time
  * timeout, the building block for user-session analytics over the
  * `events` stream at any scale.
  *
  * A session is a maximal run of events per user with gaps below
  * `gapMs`. A session is emitted ONLY once the watermark passes its
  * close time (`end + gapMs`) — never earlier, even when a later event
  * in the same batch has already opened the next session — so an
  * on-time out-of-order event can still extend or merge any session
  * the watermark has not sealed (append-mode semantics; events older
  * than the watermark are dropped, exactly like the windowed
  * aggregation path). State per key is the list of UNSEALED sessions —
  * bounded by the watermark horizon over the gap, not by history.
  *
  * Merge rule: an event at `t` joins a session `[start, end]` iff
  * `start - gapMs <= t <= end + gapMs`, extending BOTH ends (an
  * out-of-order event can arrive before the stored start); an event
  * bridging several unsealed sessions merges them all. This is the
  * same interval semantics as Spark's built-in `session_window`,
  * re-expressed as explicit state so the operator can carry arbitrary
  * per-session payload.
  */
object Sessionize {

  case class Ev(user: String, ts: Timestamp)
  case class Span(start: Long, end: Long, n: Int)
  case class SessionState(spans: List[Span])
  case class Session(user: String, start: Timestamp, end: Timestamp, events: Int)

  def sessions(
      events: Dataset[Ev],
      gapMs: Long,
      watermark: String = "10 seconds"): Dataset[Session] = {
    implicit val encState = Encoders.product[SessionState]
    implicit val encOut = Encoders.product[Session]
    implicit val encStr = Encoders.STRING

    def emit(user: String, s: Span): Session =
      Session(user, new Timestamp(s.start), new Timestamp(s.end), s.n)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val wm = state.getCurrentWatermarkMs()
          // Fold this batch's on-time events into the unsealed spans.
          // Events at or past the watermark may be out of order; events
          // behind it are late and dropped (documented append contract).
          var spans = state.getOption.map(_.spans).getOrElse(Nil)
          if (!state.hasTimedOut) {
            evs.map(_.ts.getTime).filter(_ >= wm).toArray.sorted.foreach { t =>
              val (overlap, rest) = spans.partition(s =>
                t >= s.start - gapMs && t <= s.end + gapMs)
              val merged = overlap.foldLeft(Span(t, t, 1)) { (m, s) =>
                Span(math.min(m.start, s.start), math.max(m.end, s.end),
                  m.n + s.n)
              }
              spans = merged :: rest
            }
          }
          // Seal and emit every span the watermark has passed. Sealing
          // is STRICT (`end + gapMs < wm`) to stay consistent with the
          // inclusive merge rule above: an on-time event at exactly
          // `t == end + gapMs == wm` is accepted (t >= wm) and must
          // still extend its span, so a span seals only once no
          // on-time event can legally join it (ADVICE r6). The timeout
          // is clamped to wm + 1: a live span may now close exactly AT
          // the watermark, and EventTimeTimeout requires a timestamp
          // strictly beyond it.
          val (done, live) = spans.partition(_.end + gapMs < wm)
          if (live.nonEmpty) {
            state.update(SessionState(live))
            state.setTimeoutTimestamp(
              math.max(live.map(_.end + gapMs).min, wm + 1))
          } else if (state.exists) {
            state.remove()
          }
          done.sortBy(_.start).iterator.map(emit(user, _))
      }
  }
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for sessionization (event time carried as a real timestamp so
  * watermarks apply). */
final case class SessionEvent(user_id: Long, ts: Timestamp)

/** Open-session state kept per user between triggers (epoch millis). */
final case class OpenSession(start: Long, end: Long, n: Long)

/** A closed session. `closed_by` is "gap" (a later event arrived beyond the
  * gap) or "timeout" (watermark passed end+gap with no further events). */
final case class SessionOut(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, closed_by: String)

/** Gap-based sessionization via `flatMapGroupsWithState` (SURVEY.md §2.10;
  * build brief: custom state over `KeyValueGroupedDataset`).
  *
  * The reference's "sessions" are periodic batch snapshots; the native
  * streaming shape is per-key state: each user's open session lives in the
  * state store, closes either when an event lands more than `gapMs` after
  * the session end (emitted immediately) or when the event-time watermark
  * passes end+gap (event-time timeout — no unbounded state, the 100 TB
  * requirement). State per key is O(1); emission is append-mode.
  */
object Sessionize {

  def sessions(events: Dataset[SessionEvent], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start),
              new Timestamp(s.end), s.n, "timeout"))
          } else {
            val times = it.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption.orNull
            for (t <- times) {
              if (cur == null) cur = OpenSession(t, t, 1)
              else if (t - cur.end <= gapMs)
                // min() too: a late-but-within-watermark event can precede
                // the open session's start and must extend it backwards
                cur = OpenSession(math.min(cur.start, t), math.max(cur.end, t), cur.n + 1)
              else {
                closed ::= SessionOut(user, new Timestamp(cur.start),
                  new Timestamp(cur.end), cur.n, "gap")
                cur = OpenSession(t, t, 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end + gapMs)
            }
            closed.reverse.iterator
          }
        })
  }
}

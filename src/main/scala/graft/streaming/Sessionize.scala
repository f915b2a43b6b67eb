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
  *
  * Out-of-order events (late but inside the watermark): within gap of the
  * open session they merge (extending it backwards if needed); more than
  * gap BEFORE its start they form their own earlier session, closed
  * immediately — matching the batch twin (q_event_sessions) rather than
  * bridging an arbitrary gap. (An event that would land between an
  * already-emitted early session and a later one is inherent append-mode
  * lateness — keep watermark-delay ≤ gap to avoid it entirely.)
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
            // Sessionize the batch alone, then ORDER-MERGE with the open
            // state session. A late-but-within-watermark event more than
            // gapMs BEFORE the open session's start is its own earlier
            // session (matching the batch twin q_event_sessions) — merging
            // it forward would silently bridge an arbitrary gap.
            val times = it.map(_.ts.getTime).toArray.sorted
            var batch = List.empty[OpenSession]
            for (t <- times) batch match {
              case h :: tl if t - h.end <= gapMs =>
                batch = OpenSession(h.start, math.max(h.end, t), h.n + 1) :: tl
              case _ => batch = OpenSession(t, t, 1) :: batch
            }
            val all = (state.getOption.toList ++ batch.reverse).sortBy(_.start)
            val merged = all.foldLeft(List.empty[OpenSession]) {
              case (h :: tl, s) if s.start - h.end <= gapMs =>
                OpenSession(h.start, math.max(h.end, s.end), h.n + s.n) :: tl
              case (acc, s) => s :: acc
            }.reverse
            val closed = merged.dropRight(1).map(s =>
              SessionOut(user, new Timestamp(s.start), new Timestamp(s.end),
                s.n, "gap"))
            merged.lastOption.foreach { cur =>
              state.update(cur)
              // Clamp to just past the current watermark: when only
              // late-but-in-watermark events arrive for a key (reachable
              // once watermark-delay > gap), end+gap can be ≤ watermark and
              // Spark throws IllegalArgumentException, killing the stream.
              // Clamped, the stale open session times out on the next
              // trigger instead.
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(cur.end + gapMs, wm + 1))
            }
            closed.iterator
          }
        })
  }
}

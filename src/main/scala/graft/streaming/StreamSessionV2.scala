package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap sessionization on the arbitrary-state v2 API with EVENT-TIME
  * TIMERS — the modern form of [[Sessionize]]'s flatMapGroupsWithState
  * timeout dance: instead of re-checking `state.hasTimedOut` on every
  * invocation, the processor REGISTERS a timer at (session end + gap)
  * and Spark calls [[handleExpiredTimer]] exactly when the watermark
  * passes it. Each input batch extends the open session, cancels the
  * stale timer, and re-arms; expiry emits the closed session and clears
  * state. State is one (start, end, n) triple per key.
  *
  * Scale: identical shuffle profile to any keyed stateful operator (one
  * exchange on user_id); timers live in the state store next to the
  * session triple, so idle keys cost O(1) bytes and close themselves —
  * no full-state sweep per batch, which is what makes event-time
  * timeouts viable over 100M open sessions.
  */
object StreamSessionV2 {

  case class SessionEventV2(user_id: Long, ts: java.sql.Timestamp)
  case class SessionOutV2(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)
  case class OpenSession(start: Long, end: Long, n: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEventV2, SessionOutV2] {
    @transient private var st: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEventV2],
        timerValues: TimerValues): Iterator[SessionOutV2] = {
      val ts = rows.map(_.ts.getTime).toArray
      if (ts.isEmpty) return Iterator.empty
      val (lo, hi) = (ts.min, ts.max)
      val cur = Option(st.get()) match {
        case Some(o) => OpenSession(math.min(o.start, lo),
          math.max(o.end, hi), o.n + ts.length)
        case None => OpenSession(lo, hi, ts.length.toLong)
      }
      // re-arm: one live timer per key at end + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(cur.end + gapMs)
      st.update(cur)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOutV2] = {
      val out = Option(st.get()).map(o =>
        SessionOutV2(key, o.start, o.end, o.n)).iterator
      st.clear()
      out
    }
  }

  /** Streaming gap sessions; `ds` must carry an event-time watermark at
    * least as long as callers want late data merged. */
  def sessions(ds: Dataset[SessionEventV2], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[SessionOutV2] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[SessionOutV2]
    ds.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q_holt_linear: per-key Holt linear (level + trend)
  * smoothing as incremental state on the arbitrary-state v2 API
  * (`transformWithState`, Spark 4). Each key carries (level, trend) on
  * the integer cent grid; every arriving daily observation advances the
  * recurrence one step and emits the post-update smoothed point plus a
  * 7-step-ahead forecast — the metric-monitoring shape where thousands
  * of series update continuously and a forecast must be servable after
  * every batch without a batch recompute.
  *
  * Determinism contract shared with the batch twin (the q_holt_linear
  * fold, certified by its DuckDB oracle at every SF): α = β = 1/2 with
  * floorDiv after each halving keeps state EXACTLY on the integer grid,
  * so replaying any day-ordered prefix through the stream reproduces the
  * batch fold bit-for-bit (StreamHoltSpec asserts equality against
  * plain-Scala and against the registered query at sf0.001). State is
  * one 24-byte tuple per key (RocksDB-backed at scale); out-of-order
  * days WITHIN a batch are sorted per key before folding, and the
  * upstream contract is the same watermarked daily tumbling-window agg
  * the batch twin groups by — late days past the watermark are the
  * window's problem, not the recurrence's.
  */
object StreamHolt {

  case class DailyPoint(key: String, day: Long, cents: Long)
  case class HoltPoint(key: String, day: Long, n_seen: Long,
      level: Double, trend: Double, forecast_7d: Double)
  case class HoltState(n: Long, l: Long, b: Long)

  /** One recurrence step on the integer grid — the same arithmetic as
    * the batch fold's array lambda (TrendSpec pins the identity
    * floor((l'-l+b)/2) == floor((x-l+3b)/4); this is the l'/b' form). */
  def step(l: Long, b: Long, x: Long): (Long, Long) = {
    val nl = Math.floorDiv(x + l + b, 2L)
    (nl, Math.floorDiv(nl - l + b, 2L))
  }

  class HoltProcessor
      extends StatefulProcessor[String, DailyPoint, HoltPoint] {
    @transient private var st: ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HoltState]("holt",
        Encoders.product[HoltState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DailyPoint],
        timerValues: TimerValues): Iterator[HoltPoint] = {
      val sorted = rows.toArray.sortBy(_.day)
      var s = Option(st.get()).getOrElse(HoltState(0L, 0L, 0L))
      val out = Array.newBuilder[HoltPoint]
      sorted.foreach { p =>
        s =
          if (s.n == 0L) HoltState(1L, p.cents, 0L) // l1 = y1, b1 = 0
          else {
            val (nl, nb) = step(s.l, s.b, p.cents)
            HoltState(s.n + 1, nl, nb)
          }
        out += HoltPoint(key, p.day, s.n, s.l / 100.0, s.b / 100.0,
          (s.l + 7 * s.b) / 100.0)
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** Streaming side: append-mode smoothed point per daily observation. */
  def smoothed(ds: Dataset[DailyPoint]): Dataset[HoltPoint] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[HoltPoint]
    ds.groupByKey(_.key)
      .transformWithState(new HoltProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch twin: the same fold in plain Scala over a day-ordered series
    * (what q_holt_linear's `aggregate` lambda computes per key). */
  def batchFold(xs: Seq[Long]): HoltState =
    xs.tail.foldLeft(HoltState(1L, xs.head, 0L)) { case (s, x) =>
      val (nl, nb) = step(s.l, s.b, x)
      HoltState(s.n + 1, nl, nb)
    }
}

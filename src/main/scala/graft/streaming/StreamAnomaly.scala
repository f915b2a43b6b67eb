package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key streaming anomaly flagger on the arbitrary-state v2 API
  * (`transformWithState`, Spark 4 — the successor to
  * flatMapGroupsWithState used by [[Sessionize]]): each user carries a
  * running (count, cents-sum) baseline in a ValueState, and an event is
  * flagged when it exceeds `factor`× the running mean after at least
  * `minBaseline` prior events.
  *
  * Determinism contract shared with the batch twin
  * ([[StreamAnomaly.batchFlags]], certified by the q_running_anomaly_flags
  * oracle): the baseline is EXACT integer cents, the comparison is the
  * cross-multiplied integer test v·n > factor·sum (no division, no
  * floats), and per-user order is (ts, event_id) — so stream and batch
  * agree row-for-row on any replay. State is one 16-byte tuple per user
  * (RocksDB-backed at scale); pass a TTL to bound the key universe when
  * users churn.
  */
object StreamAnomaly {

  case class MeterEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  case class AnomalyFlag(user_id: Long, event_id: Long, value: Double,
      base_n: Long, base_mean: Double)
  case class Baseline(n: Long, sc: Long)

  val MinBaseline = 5
  val Factor = 3L

  class AnomalyProcessor
      extends StatefulProcessor[Long, MeterEvent, AnomalyFlag] {
    @transient private var st: ValueState[Baseline] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Baseline]("baseline",
        Encoders.product[Baseline], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MeterEvent],
        timerValues: TimerValues): Iterator[AnomalyFlag] = {
      // batch-internal order is not guaranteed: sort this key's slice by
      // the same (ts, event_id) key the batch twin windows over
      val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      var b = Option(st.get()).getOrElse(Baseline(0L, 0L))
      val out = Array.newBuilder[AnomalyFlag]
      sorted.foreach { e =>
        val v = math.round(e.value * 100) // cents, the exact grid
        if (b.n >= MinBaseline && v * b.n > Factor * b.sc)
          out += AnomalyFlag(e.user_id, e.event_id, e.value, b.n,
            b.sc.toDouble / b.n / 100.0)
        b = Baseline(b.n + 1, b.sc + v)
      }
      st.update(b)
      out.result().iterator
    }
  }

  /** Streaming side: append-mode flags per event. */
  def flags(ds: Dataset[MeterEvent]): Dataset[AnomalyFlag] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[AnomalyFlag]
    ds.groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch twin over any frame with (user_id, event_id, ts_us, v cents):
    * identical flags via an exclusive running window — the oracle-
    * certifiable form. */
  def batchFlags(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bn", count(lit(1)).over(w))
      .withColumn("bs", coalesce(sum("v").over(w), lit(0L)))
      .filter(col("bn") >= MinBaseline &&
        col("v") * col("bn") > lit(Factor) * col("bs"))
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import StreamAnomaly.{AnomalyFlag, MeterEvent}

/** transformWithState anomaly flagger: state carries the exact-cents
  * running baseline across batches, and the flags must match the batch
  * twin (the oracle-certified q_running_anomaly_flags plan) row-for-row
  * on the same fixture. transformWithState requires the RocksDB state
  * store provider — set for the query, restored after. */
class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val Base = 1_700_000_000L // seconds
  private def ev(user: Long, id: Long, sec: Long, v: Double) =
    MeterEvent(user, id, new Timestamp((Base + sec) * 1000), v)

  // user 1: five 10.00 baseline events, then a 50.00 spike (flag), then a
  // 12.00 normal event (the spike raised the mean; still no flag), then a
  // second spike 80.00 (flag). user 2: never reaches the 5-event minimum.
  private val fixture = Seq(
    ev(1, 1, 10, 10.0), ev(1, 2, 20, 10.0), ev(1, 3, 30, 10.0),
    ev(1, 4, 40, 10.0), ev(1, 5, 50, 10.0),
    ev(1, 6, 60, 50.0), ev(1, 7, 70, 12.0), ev(1, 8, 80, 80.0),
    ev(2, 9, 10, 5.0), ev(2, 10, 20, 99.0))

  private def runStreaming(batches: Seq[Seq[MeterEvent]]): Seq[AnomalyFlag] = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[MeterEvent]
      val q = StreamAnomaly.flags(input.toDS())
        .writeStream.format("memory").queryName("anomaly_out")
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table("anomaly_out").as[AnomalyFlag].collect().toSeq
          .sortBy(f => (f.user_id, f.event_id))
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      prev.foreach(spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  private def batchTwin: Seq[AnomalyFlag] =
    StreamAnomaly.batchFlags(fixture.toDF()
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v")))
      .select(col("user_id"), col("event_id"),
        (col("v") / 100.0).as("value"), col("bn").as("base_n"),
        (col("bs") / col("bn") / 100.0).as("base_mean"))
      .as[AnomalyFlag].collect().toSeq.sortBy(f => (f.user_id, f.event_id))

  test("flags spike events only after the baseline minimum; batch parity") {
    val got = runStreaming(Seq(fixture))
    assert(got.map(_.event_id) == Seq(6L, 8L))
    assert(got == batchTwin)
  }

  test("state persists across batches: same flags when fed one event at a time") {
    val got = runStreaming(fixture.map(Seq(_)))
    assert(got == batchTwin)
  }

  test("mid-stream batch split does not double-count the baseline") {
    val (a, b) = fixture.splitAt(6)
    assert(runStreaming(Seq(a, b)) == batchTwin)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import StreamSessionV2.{SessionEventV2, SessionOutV2}

/** Event-time-timer sessionization (transformWithState v2): sessions
  * close when the WATERMARK passes end + gap — driven here by feeding a
  * later event from another user — and a new event before that merges
  * into the open session and re-arms the timer. */
class StreamSessionV2Spec extends SparkSpec {
  import spark.implicits._

  private val Base = 1_700_000_000L
  private def ev(user: Long, sec: Long) =
    SessionEventV2(user, new Timestamp((Base + sec) * 1000))

  private def run(batches: Seq[Seq[SessionEventV2]]): Seq[SessionOutV2] = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[SessionEventV2]
      val q = StreamSessionV2.sessions(input.toDS(), gapMs = 60_000)
        .writeStream.format("memory").queryName("sess_v2")
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table("sess_v2").as[SessionOutV2].collect().toSeq
          .sortBy(s => (s.user_id, s.session_start))
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      prev.foreach(spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("timer fires when the watermark passes end + gap") {
    // user 1's burst; then user 2 far in the future pushes the watermark
    val got = run(Seq(
      Seq(ev(1, 100), ev(1, 130)),
      Seq(ev(2, 5000)),   // watermark → ~4990s ≫ 130+60
      Seq(ev(2, 9000))))  // closes user 2's first burst? no — merges; pushes wm
    val u1 = got.filter(_.user_id == 1)
    assert(u1.length === 1)
    assert(u1.head.session_start === (Base + 100) * 1000)
    assert(u1.head.session_end === (Base + 130) * 1000)
    assert(u1.head.n_events === 2)
  }

  test("an event before expiry merges and re-arms instead of closing") {
    val got = run(Seq(
      Seq(ev(1, 100)),
      Seq(ev(1, 140)),          // within gap: merge, re-arm at 200
      Seq(ev(2, 5000)),         // watermark jump closes user 1 ONCE
      Seq(ev(2, 9000))))
    val u1 = got.filter(_.user_id == 1)
    assert(u1.length === 1)
    assert(u1.head.n_events === 2)
    assert(u1.head.session_end === (Base + 140) * 1000)
  }

  test("separate bursts beyond the gap become separate sessions") {
    val got = run(Seq(
      Seq(ev(1, 100)),
      Seq(ev(2, 1000)),          // wm ~990: closes burst 1
      Seq(ev(1, 2000)),          // new session for user 1
      Seq(ev(2, 9000))))         // closes it
    val u1 = got.filter(_.user_id == 1)
    assert(u1.map(_.n_events) === Seq(1, 1))
    assert(u1.map(_.session_start) ===
      Seq((Base + 100) * 1000, (Base + 2000) * 1000))
  }
}

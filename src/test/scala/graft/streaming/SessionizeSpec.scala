package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Drives flatMapGroupsWithState sessionization on a MemoryStream: sessions
  * close by gap (a later event arrives) and by event-time timeout (the
  * watermark passes end+gap). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // base offset keeps fixtures clear of the initial watermark (epoch 0):
  // a row AT the watermark is dropped as late data
  private val Base = 1_000_000L
  private def ev(user: Long, sec: Long) =
    SessionEvent(user, new Timestamp((Base + sec) * 1000))

  test("late in-watermark event extends the open session backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS(), gapMs = 60_000)
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    try {
      input.addData(ev(1, 100))
      q.processAllAvailable() // watermark now Base+90
      input.addData(ev(1, 95)) // late but inside the watermark → must merge
      q.processAllAvailable()
      input.addData(ev(1, 5000)) // closes the session by gap
      q.processAllAvailable()
      val closed = spark.table("sess2").as[SessionOut].collect()
        .filter(_.closed_by == "gap")
      assert(closed.length === 1)
      assert(closed.head.n_events === 2)
      // start moved BACK to the late event — matches the batch twin
      assert(closed.head.session_start.getTime === (Base + 95) * 1000)
      assert(closed.head.session_end.getTime === (Base + 100) * 1000)
    } finally q.stop()
  }

  test("late event more than gap BEFORE the open session closes as its own session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // long watermark so the early event is late-but-in-watermark
    val q = Sessionize.sessions(input.toDS(), gapMs = 60_000, watermark = "2 hours")
      .writeStream.format("memory").queryName("sess3").outputMode("append").start()
    try {
      input.addData(ev(1, 5000))
      q.processAllAvailable()
      // 4900s before the open session's start (≫ 60s gap): the batch twin
      // would put this in a separate earlier session — so must we
      input.addData(ev(1, 100))
      q.processAllAvailable()
      val closed = spark.table("sess3").as[SessionOut].collect()
      assert(closed.length === 1)
      assert(closed.head.closed_by === "gap")
      assert(closed.head.n_events === 1)
      assert(closed.head.session_start.getTime === (Base + 100) * 1000)
      assert(closed.head.session_end.getTime === (Base + 100) * 1000)
      // the open session at 5000s is untouched: close it by gap and check
      input.addData(ev(1, 20000))
      q.processAllAvailable()
      val later = spark.table("sess3").as[SessionOut].collect()
        .filter(_.session_start.getTime == (Base + 5000) * 1000)
      assert(later.length === 1)
      assert(later.head.n_events === 1)
    } finally q.stop()
  }

  test("sessions close on gap and on event-time timeout; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS(), gapMs = 60_000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // one session: events 12s apart (< 60s gap)
      input.addData(ev(1, 0), ev(1, 12))
      q.processAllAvailable()
      assert(spark.table("sess").count() === 0) // still open

      // event at t=2000s: 2000-12 > 60 → closes session 1 by gap
      input.addData(ev(1, 2000))
      q.processAllAvailable()
      val gapClosed = spark.table("sess").as[SessionOut].collect()
      assert(gapClosed.length === 1)
      assert(gapClosed.head.n_events === 2)
      assert(gapClosed.head.closed_by === "gap")
      assert(gapClosed.head.session_start.getTime === 1_000_000_000L)
      assert(gapClosed.head.session_end.getTime === 1_000_012_000L)

      // another user far in the future advances the watermark beyond
      // 2000s+60s; the next trigger fires user 1's event-time timeout
      input.addData(ev(2, 9000))
      q.processAllAvailable()
      input.addData(ev(2, 9010))
      q.processAllAvailable()
      val all = spark.table("sess").as[SessionOut].collect()
      val timedOut = all.filter(_.closed_by == "timeout")
      assert(timedOut.length === 1)
      assert(timedOut.head.user_id === 1L)
      assert(timedOut.head.n_events === 1)
      assert(timedOut.head.session_start.getTime === (1_000_000L + 2000L) * 1000)
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** The round-8 residual closed in round 9: a query hung in Catalyst
  * ANALYSIS (no Spark jobs to cancel, interrupts ignored) must cost one
  * sweep line, not a pool slot forever. The hang is simulated by a
  * builder that busy-spins ignoring interrupts — exactly the observable
  * behavior of an exponential-lineage analysis hang. */
object VerifySpecState {
  @volatile var stop = false
}

class VerifySpec extends SparkSpec {

  private val hang: (SparkSession, String) => DataFrame = (s, _) => {
    while (!VerifySpecState.stop) Thread.onSpinWait()
    s.range(1).toDF("id")
  }

  private def normal(n: Int): (SparkSession, String) => DataFrame =
    (s, _) => s.range(n).toDF("id")

  test("a hung query does not wedge the sweep — other queries complete") {
    VerifySpecState.stop = false // order/re-run independence (r9 advisor)
    val out = Files.createTempDirectory("verify-spec").toString
    try {
      val queries = ("q_hang" -> hang) +:
        (1 to 5).map(i => s"q_ok_$i" -> normal(i))
      val statuses = Verify.runSweep(spark, queries, "unused", out,
        nThreads = 2, timeoutSec = 5).toMap
      assert(statuses("q_hang") == "timeout")
      (1 to 5).foreach { i =>
        assert(statuses(s"q_ok_$i") == "ok", s"q_ok_$i: ${statuses(s"q_ok_$i")}")
        assert(new java.io.File(s"$out/q_ok_$i").exists())
      }
    } finally VerifySpecState.stop = true
  }

  test("the watchdog reclaims a hung slot at 2x timeout (single-width pool)") {
    VerifySpecState.stop = false
    val out = Files.createTempDirectory("verify-spec2").toString
    try {
      // width 1: the hang occupies THE slot; the queued query can only
      // ever run if the watchdog's 2x-timeout reclaim releases a
      // replacement permit — the proof of reclaim is its output landing
      // on disk (the run budget starts at actual task start, so queue
      // time behind the hang cannot cancel it un-run).
      Verify.runSweep(spark, Seq("q_hang2" -> hang, "q_after" -> normal(3)),
        "unused", out, nThreads = 1, timeoutSec = 2)
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      val okFile = new java.io.File(s"$out/q_after/_SUCCESS")
      while (!okFile.exists() && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(okFile.exists(),
        "queued query never ran — hung slot was not reclaimed")
    } finally VerifySpecState.stop = true
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.nio.file.{Files, Paths}

/** End-to-end streaming pipeline (VERDICT r2 item 8): all three stages run
  * as Structured Streaming —
  *   stage A: file source → content-hash dedup → gap sessionization
  *            (flatMapGroupsWithState) → parquet stage table
  *   stage B: file source over the stage table → 7-day tumbling window
  * — and the result is compared EXACTLY to the batch twin (the
  * q_event_sessions lag/running-sum sessionization followed by the same
  * 7-day window) on sf0.001 events.
  *
  * Why two chained queries, not one: a session emitted by
  * flatMapGroupsWithState necessarily has session_start OLDER than the
  * watermark that closed it, so Spark (4.x, allowMultiple stateful ops)
  * rejects the fused form both ways — redefining the watermark downstream
  * is disallowed, and an un-watermarked append aggregation is unsupported.
  * Stage-to-table chaining is the supported production topology for this
  * shape (and what a 100 TB deployment does anyway: the session table is a
  * queryable asset, not an opaque intermediate).
  *
  * Both sides work at millisecond resolution: SessionEvent carries
  * java.sql.Timestamp whose getTime() truncates the parquet's
  * microseconds, so the batch twin sessionizes on unix_millis(ts). */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 3600L * 1000L // 1-hour inactivity gap (as q_event_sessions)
  private val Sentinel = 999999L

  test("file source → dedup → sessionize → 7d window equals the batch twin") {
    val dir = Files.createTempDirectory("graft-e2e").toString
    val srcDir = s"$dir/src"
    val sessDir = s"$dir/sessions"

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_id"))
    ev.coalesce(1).write.parquet(srcDir)
    val maxTs = ev.agg(max(unix_millis(col("ts")))).collect().head.getLong(0)

    // sentinel files advance the event-time watermark so every real
    // session times out; modification times force the processing order
    def addSentinel(plusDays: Int): Unit = {
      Seq((Sentinel, new java.sql.Timestamp(maxTs + plusDays * 86400000L), -1L))
        .toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(srcDir)
      Files.list(Paths.get(srcDir)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).map(new java.io.File(_))
        .sortBy(_.lastModified()).zipWithIndex
        .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }
    }
    addSentinel(60)
    addSentinel(120)

    // ---- stage A: ingest dedup → stateful sessionization → stage table
    val sch = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    // no watermark here: Sessionize declares the ts watermark downstream,
    // and Spark forbids redefining it (dedup state is unbounded in this
    // fixture; production bounds it with dropDuplicatesWithinWatermark
    // upstream of the session stage instead)
    val deduped = src
      .withColumn("content_hash",
        sha2(concat_ws("§", col("user_id"), col("event_id")), 256))
      .dropDuplicates("content_hash")
    val sessions = Sessionize.sessions(
      deduped.select(col("user_id"), col("ts")).as[SessionEvent], GapMs,
      watermark = "1 second")
    val qA = sessions.writeStream.format("parquet")
      .option("path", sessDir)
      .option("checkpointLocation", s"$dir/ckptA")
      .outputMode("append").start()
    try qA.processAllAvailable() finally qA.stop()

    // ---- stage B: streaming 7-day tumbling window over the session table
    val sessSch = spark.read.parquet(sessDir).schema
    val sessSrc = spark.readStream.schema(sessSch).parquet(sessDir)
    val windowed = sessSrc
      .filter(col("user_id") =!= Sentinel)
      .withWatermark("session_start", "1 second")
      .groupBy(col("user_id"), window(col("session_start"), "7 days").as("w"))
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .select(col("user_id"), unix_millis(col("w.start")).as("window_start"),
        col("n_sessions"), col("n_events"))
    val qB = windowed.writeStream.format("memory").queryName("e2e")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckptB").start()
    try qB.processAllAvailable() finally qB.stop()

    val streamed = spark.table("e2e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // ---- batch twin: q_event_sessions' lag → is_new → running-sum
    // sessions (ms resolution), then the SAME 7-day window
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("event_id").asc)
    val bSessions = ev
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag("ms", 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev").isNull || col("ms") - col("prev") > GapMs, 1L)
          .otherwise(0L))
      .withColumn("seq", sum("is_new").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min("ms").as("start_ms"), count(lit(1)).as("n_events"))
    val batch = bSessions
      .groupBy(col("user_id"),
        window(timestamp_millis(col("start_ms")), "7 days").as("w"))
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .select(col("user_id"), unix_millis(col("w.start")).as("window_start"),
        col("n_sessions"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}\nbatch-only: ${batch -- streamed}")
  }
}

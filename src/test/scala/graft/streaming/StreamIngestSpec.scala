package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Drives the streaming ingest end-to-end on a MemoryStream: cross-batch
  * hash idempotency (the reference's UNIQUE content_hash semantics) and the
  * windowed summary shape. */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch ingest drops duplicate hashes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = s"$dir/store"
    val ckpt = s"$dir/ckpt"

    val stream = StreamIngest.withIngestMeta(
      mem.toDF().toDF("id", "payload"), Seq("payload"))
    val writer = StreamIngest.dedupedForeachBatch(stream, store, ckpt, "id")
    val q = writer.start()

    // batch 1: a, b, b(in-batch dup)
    mem.addData((1L, "a"), (2L, "b"), (3L, "b"))
    q.processAllAvailable()
    // batch 2: b(cross-batch dup), c
    mem.addData((4L, "b"), (5L, "c"))
    q.processAllAvailable()
    q.stop()

    val stored = spark.read.parquet(store)
    assert(stored.count() === 3) // a, b, c — both dup forms dropped
    assert(stored.select("payload").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    // the kept "b" is the first by order column (id=2)
    assert(stored.filter($"payload" === "b").select("id").as[Long].collect().head === 2L)
  }

  test("watermarked dedup + tumbling summary on a batch frame") {
    val df = Seq(
      (10L, "x", "2026-01-01 00:00:00"),
      (10L, "y", "2026-01-03 00:00:00"),
      (10L, "y", "2026-01-04 00:00:00"), // dup hash, same window
      (20L, "z", "2026-01-10 00:00:00")) // next 7-day window
      .toDF("entity_id", "payload", "ts")
      .withColumn("collected_at", to_timestamp($"ts"))
      .withColumn("content_hash", sha2($"payload", 256))
    val out = StreamIngest.tumblingSummary(df, "entity_id")
      .orderBy("entity_id", "window_start").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("signal_count") === 3)
    assert(out(0).getAs[Long]("distinct_signals") === 2)
    assert(out(1).getAs[Long]("signal_count") === 1)
  }

  test("stream-static enrichment broadcasts the dim side per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val dim = Seq(("AAA", "Tech"), ("BBB", "Health")).toDF("ticker", "sector")
    val q = StreamIngest.enrich(mem.toDF().toDF("ticker", "score"), dim, "ticker")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData(("AAA", 71.0), ("ZZZ", 12.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").orderBy("ticker").collect()
      assert(rows.map(r => (r.getString(0), r.getAs[String]("sector"))).toSeq ==
        Seq(("AAA", "Tech"), ("ZZZ", null))) // left join keeps unmatched
    } finally q.stop()
  }

  test("streaming watermarked dedup emits each hash once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("payload", "collected_at")
      .withColumn("content_hash", sha2($"payload", 256))
    val deduped = StreamIngest.watermarkedDedup(stream)
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    mem.addData(("p", t), ("p", t), ("q", t))
    q.processAllAvailable()
    mem.addData(("p", t)) // cross-batch dup within watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT payload FROM dedup_out").as[String].collect()
    assert(rows.sorted.toSeq == Seq("p", "q"))
  }

  test("dropDuplicatesWithinWatermark dedups inside the delay, evicts after") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("payload", "collected_at")
      .withColumn("content_hash", sha2($"payload", 256))
    val q = StreamIngest.boundedDedup(stream, "1 hour")
      .writeStream.format("memory").queryName("bounded_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // p twice within the watermark delay → one emission
      mem.addData(("p", ts("2026-01-01 00:00:00")), ("p", ts("2026-01-01 00:10:00")))
      q.processAllAvailable()
      // advance event time far past the delay → p's dedup state is evicted
      mem.addData(("x", ts("2026-01-01 06:00:00")))
      q.processAllAvailable()
      // p recurs AFTER eviction → re-emitted (bounded-state trade-off; the
      // forever-dedup guarantee lives in dedupedForeachBatch)
      mem.addData(("p", ts("2026-01-01 06:30:00")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT payload FROM bounded_out").as[String].collect()
      assert(rows.sorted.toSeq == Seq("p", "p", "x"))
    } finally q.stop()
  }
}

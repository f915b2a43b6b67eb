package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.sources.Upsert

/** Streaming ingest (SURVEY.md §2.10): the reference has no streaming
  * runtime — "streams" are periodic batch collections made idempotent by a
  * content-hash UNIQUE constraint (schema.sql:85,139; gate at
  * collect_signals.py:221-222,267-268). Two mappings are offered:
  *
  *  1. `dedupedForeachBatch` — EXACT parity: every micro-batch anti-joins
  *     the accumulated seen-hash set (Upsert.dedupGate), then appends. This
  *     reproduces "duplicates dropped by hash forever", not windowed.
  *  2. `watermarkedDedup` — the native Structured Streaming shape:
  *     `dropDuplicates` on the hash with a long watermark on the ingest-time
  *     column. Approximate w.r.t. the reference (state is bounded by the
  *     watermark) but fully engine-managed — the 100 TB-friendly variant.
  *
  * Time semantics preserved from the reference: event time = published_at
  * (nullable), ingest time = collected_at (non-null default now) — windowed
  * reads key on collected_at BECAUSE published_at can be null
  * (hr_baselines.py:60-61).
  */
object StreamIngest {

  /** Add the reference's ingest metadata: content hash + collected_at. */
  def withIngestMeta(df: DataFrame, contentCols: Seq[String]): DataFrame =
    df.withColumn("content_hash", sha2(concat_ws("§", contentCols.map(col): _*), 256))
      .withColumn("collected_at", current_timestamp())

  /** Exact-parity idempotent sink: per micro-batch, drop rows whose hash is
    * already in the parquet store at `storePath` (cross-run state), dedup
    * within the batch deterministically, then append. */
  def dedupedForeachBatch(stream: DataFrame, storePath: String,
      checkpoint: String, orderCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val inBatch = Upsert.dedupInBatch(batch.toDF(), "content_hash",
          Seq(col(orderCol).asc))
        val seen =
          try spark.read.parquet(storePath).select("content_hash")
          catch { case _: Throwable => spark.emptyDataFrame.withColumn("content_hash", lit("")) }
        val fresh =
          if (seen.isEmpty) inBatch
          else Upsert.dedupGate(inBatch, seen, "content_hash")
        fresh.write.mode("append").parquet(storePath)
        ()
      }

  /** Stream-static enrichment: join each micro-batch against a broadcast
    * dimension frame (the reference hydrates company metadata per collected
    * signal — company_service.py joins on ticker). The static side is
    * re-resolved per micro-batch by Structured Streaming, so a refreshed
    * dim table is picked up without restarting the query; broadcast keeps
    * the stream side shuffle-free. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Engine-managed variant: watermarked stream dedup on the content hash. */
  def watermarkedDedup(stream: DataFrame, watermark: String = "30 days"): DataFrame =
    stream.withWatermark("collected_at", watermark)
      .dropDuplicates("content_hash")

  /** Strictly state-bounded variant: `dropDuplicatesWithinWatermark`
    * guarantees dedup only for duplicates arriving within the watermark
    * delay of each other, and in exchange EVICTS hash state once the
    * watermark passes — the shape to run at 100 TB/day, where
    * `dropDuplicates` state (keyed on every hash ever seen inside the
    * watermark, compared by event time) grows without that bound. A hash
    * recurring after eviction is re-emitted; the exact-parity forever-dedup
    * is `dedupedForeachBatch`. */
  def boundedDedup(stream: DataFrame, watermark: String = "1 hour"): DataFrame =
    stream.withWatermark("collected_at", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** 7-day tumbling per-(entity, window) signal summary
    * (signal_summaries.py:82-96 → window() on ingest time). Works on both
    * a static DataFrame and a stream (append mode after watermark). */
  def tumblingSummary(df: DataFrame, entityCol: String,
      tsCol: String = "collected_at", width: String = "7 days"): DataFrame =
    df.groupBy(col(entityCol), window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("signal_count"),
        countDistinct("content_hash").as("distinct_signals"))
      .select(col(entityCol), col("w.start").as("window_start"),
        col("signal_count"), col("distinct_signals"))
}

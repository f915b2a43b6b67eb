package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join (SURVEY.md §2.10 extension):
  * the incremental twin of TemporalQueries.q_click_attribution — purchases
  * attributed to the nearest preceding click by the same user within the
  * lookback window, computed continuously as both event streams arrive.
  *
  * State-bounding is the whole design: each side carries a watermark and
  * the join condition carries a BOTH-SIDED time band
  * (click_ts <= purchase_ts <= click_ts + lookback), which is exactly what
  * Structured Streaming needs to prove a click can stop waiting for
  * matching purchases (and vice versa) and evict it from the join state.
  * Without the band, stream-stream join state grows forever — the 100 TB
  * failure mode. With it, per-executor state is O(events in the watermark
  * + lookback horizon), independent of stream length.
  *
  * The nearest-click argmin does NOT run in the stream: min-gap per
  * purchase is a non-windowed aggregate over an unbounded key set, which
  * append-mode streaming cannot finalize. The streaming stage emits the
  * matched PAIRS (append mode, exactly the join's watermark-complete
  * output); the per-purchase/per-user rollup runs wherever the pairs land
  * (foreachBatch upsert or downstream batch) — the same split the
  * reference applies between collection and summary jobs.
  */
object StreamJoin {

  /** Matched (purchase, click) pairs within the lookback band.
    *
    * @param clicks    stream with (user_id, ts) — the cause side
    * @param purchases stream with (event_id, user_id, ts) — the effect side
    * @param watermark max event-time disorder tolerated per side
    * @param lookback  attribution horizon (SQL interval literal body)
    */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes", lookback: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val p = purchases.select(col("event_id").as("p_event"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $lookback"))
      .select(col("p_event"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Batch rollup of the emitted pairs to the q_click_attribution result
    * shape: nearest click per purchase, then per-user counts + mean gap.
    * Deterministic given the full pair set — the spec runs it over the
    * streaming sink and over a batch self-join and asserts equality. */
  def rollup(pairs: DataFrame): DataFrame =
    pairs.withColumn("gap_us", unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
      .groupBy("p_event", "user_id").agg(min("gap_us").as("gap_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_attributed"),
        graft.queries.Det.dround(
          avg(col("gap_us").cast("double") / 60000000.0), 4).as("avg_gap_min"))
}

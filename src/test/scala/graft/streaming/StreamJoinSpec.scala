package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-stream interval join vs its batch twin: StreamJoin.attributionPairs
  * over file-sourced click/purchase streams must produce EXACTLY the pair
  * set of the equivalent batch self-join (and the rollup must equal
  * q_click_attribution's result shape) on sf0.001 events.
  *
  * Inner stream-stream joins emit matches eagerly (the watermark + two-sided
  * time band exist for STATE EVICTION, not emission), so processAllAvailable
  * drains the complete result without sentinel rows.
  */
class StreamJoinSpec extends SparkSpec {

  test("watermarked interval join equals batch self-join on sf0.001") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    ev.coalesce(2).write.parquet(s"$dir/src")

    val sch = spark.read.parquet(s"$dir/src").schema
    def side(t: String) = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
      .filter(col("event_type") === t)
    val pairs = StreamJoin.attributionPairs(
      side("click"), side("purchase"),
      watermark = "10 minutes", lookback = "1 hour")
    val q = pairs.writeStream.format("memory").queryName("ssj_pairs")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj_pairs")

    // batch twin over the same frame
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val batchPairs = purchases.join(clicks,
        col("p_user") === col("c_user") && col("c_ts") <= col("p_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 hour"))
      .select(col("p_event"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("p_event"), col("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val sPairs = keyed(streamed)
    val bPairs = keyed(batchPairs)
    assert(bPairs.nonEmpty, "fixture produced no attribution pairs")
    assert(sPairs === bPairs,
      s"stream-only: ${sPairs -- bPairs}\nbatch-only: ${bPairs -- sPairs}")

    // rollup over streamed pairs == rollup over batch pairs (argmin + mean)
    val sRoll = StreamJoin.rollup(streamed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bRoll = StreamJoin.rollup(batchPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sRoll === bRoll)
  }
}

package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchFunctions
import java.nio.file.Files

/** Streaming sketch ROLLUP: the daily KMV partial table (q_sketch_rollup's
  * storable sketch column) maintained by Structured Streaming. Like the
  * CMS grid, the state is constant-size per key — #days × K longs — which
  * makes complete-mode aggregation the canonical shape, not the
  * anti-pattern. The streamed partial table must yield the SAME weekly
  * merged estimates as the batch rollup: KMV buffers are deterministic
  * SETS (bottom-k of what was seen), so arrival order and batch
  * boundaries cannot change them. */
class StreamSketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 128

  private def withDayHash(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("day", expr("ts_us div 86400000000"))
    .withColumn("week", expr("day div 7"))
    .withColumn("h", pmod(xxhash64(col("user_id")), lit(4294967296L)))

  private def weeklyFromPartials(daily: org.apache.spark.sql.DataFrame) =
    daily.withColumn("week", expr("day div 7"))
      .groupBy("week")
      .agg(SketchFunctions.kmvMergeEst(col("sk"), K).as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("streamed daily partials merge to the same weekly estimates as " +
      "the batch rollup") {
    val dir = Files.createTempDirectory("graft-skroll").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"))

    // three arrival chunks → at least three micro-batches
    ev.filter(col("user_id") % 3 === 0).write.parquet(s"$dir/src")
    ev.filter(col("user_id") % 3 === 1)
      .write.mode("append").parquet(s"$dir/src")
    ev.filter(col("user_id") % 3 === 2)
      .write.mode("append").parquet(s"$dir/src")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/src")
    val q = withDayHash(stream)
      .groupBy("day")
      .agg(SketchFunctions.kmvSketchPartial(col("h"), K).as("sk"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/daily")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = weeklyFromPartials(
      spark.read.parquet(s"$dir/daily"))
    val batch = weeklyFromPartials(
      withDayHash(ev).groupBy("day")
        .agg(SketchFunctions.kmvSketchPartial(col("h"), K).as("sk")))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and the estimates track the exact distinct counts within 3σ
    val exact = withDayHash(ev).groupBy("week")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val band = 3.0 / math.sqrt(K - 2)
    exact.foreach { case (w, n) =>
      assert(math.abs(streamed(w) - n) <= math.max(3.0, band * n),
        s"week $w: est ${streamed(w)} vs exact $n")
    }
  }
}

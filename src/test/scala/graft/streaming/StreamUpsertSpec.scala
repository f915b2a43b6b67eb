package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming MERGE (S9 as a continuous sink): a file-sourced event stream
  * upserted per micro-batch into a keyed parquet store via
  * `Upsert.lastWins` in foreachBatch — the streaming topology for keeping
  * a latest-state dimension table continuously current. After the stream
  * drains, the store must EXACTLY equal the batch lastWins over the same
  * data (micro-batch decomposition must not change MERGE semantics —
  * the associativity the reference's per-run MERGE relies on).
  *
  * Scale note: each micro-batch rewrites the store here (fixture-sized);
  * at 100 TB the store is partitioned by key prefix and the rewrite
  * touches only partitions with incoming keys (dynamic partition
  * overwrite) — the window inside lastWins is already key-partitioned.
  */
class StreamUpsertSpec extends SparkSpec {

  test("foreachBatch lastWins upsert equals batch MERGE on sf0.001") {
    val dir = Files.createTempDirectory("graft-upsert").toString
    val store = s"$dir/store"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
    // several source files → several micro-batches (maxFilesPerTrigger=1)
    ev.repartition(4).write.parquet(s"$dir/src")

    val sch = spark.read.parquet(s"$dir/src").schema
    val src = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val q = src.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sp = batch.sparkSession
        val base =
          try sp.read.parquet(store)
          catch { case _: Throwable => sp.createDataFrame(
            sp.sparkContext.emptyRDD[Row], batch.schema) }
        val merged = graft.sources.Upsert.lastWins(
          base, batch.toDF(), Seq("user_id", "event_type"),
          Seq("ts_us", "event_id"))
        // write-then-swap: lastWins reads `store`, so an in-place overwrite
        // would truncate its own input mid-plan
        val tmp = s"$store.next"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          sp.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(store))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "event_type", "event_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val streamed = keyed(spark.read.parquet(store))
    // batch twin: one lastWins of everything against an empty base. The
    // per-(key) winner is the global (ts_us, event_id) max — micro-batch
    // order cannot matter because lastWins is associative in that order
    val batchTwin = keyed(graft.sources.Upsert.lastWins(
      ev.limit(0), ev, Seq("user_id", "event_type"), Seq("ts_us", "event_id")))
    assert(streamed.nonEmpty)
    assert(streamed === batchTwin,
      s"stream-only: ${(streamed -- batchTwin).take(3)}\n" +
        s"batch-only: ${(batchTwin -- streamed).take(3)}")
  }
}

package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue

/** Pipeline observability via Dataset.observe: gate metrics (rows in,
  * rows dropped) ride the SAME pass as the data — no second scan, no
  * accumulator races — and surface through QueryExecutionListener (batch)
  * and StreamingQueryProgress (streaming). This is how the ingest gates
  * report drop rates at 100 TB: a observe() node costs one map-side
  * aggregate merged at the driver, vs a .count() costing a full re-scan
  * per metric. */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("batch gate metrics ride the data pass (QueryExecutionListener)") {
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.get("gate").foreach { row =>
          seen.add((row.getAs[Long]("rows_in"), row.getAs[Long]("dups_in")))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c"), (5L, "b"))
        .toDF("id", "payload")
        .withColumn("content_hash", sha2($"payload", 256))
      val gated = df
        .withColumn("_dup",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("content_hash").orderBy("id")) > 1)
        .observe("gate",
          count(lit(1)).as("rows_in"),
          sum(when($"_dup", 1L).otherwise(0L)).as("dups_in"))
        .filter(!$"_dup").drop("_dup")
      assert(gated.count() === 3)
      // the listener fires asynchronously — poll with a bound
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!seen.asScala().contains((5L, 2L)) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      // at least one successful action observed the gate metrics
      assert(seen.asScala().exists(_ == ((5L, 2L))),
        s"observed: ${seen.toArray.mkString(",")}")
    } finally spark.listenerManager.unregister(listener)
  }

  // ConcurrentLinkedQueue lacks asScala without the converters import
  private implicit class QOps(q: ConcurrentLinkedQueue[(Long, Long)]) {
    def asScala(): Seq[(Long, Long)] = {
      val b = Seq.newBuilder[(Long, Long)]
      q.forEach(e => b += e)
      b.result()
    }
  }

  test("streaming gate metrics surface per micro-batch in the progress " +
      "(observedMetrics)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val observed = mem.toDF().toDF("id", "payload")
      .withColumn("content_hash", sha2($"payload", 256))
      .observe("ingest",
        count(lit(1)).as("rows_in"),
        approx_count_distinct($"content_hash").as("approx_distinct"))
    val q = observed.writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-obs").toString)
      .start()
    mem.addData((1L, "x"), (2L, "y"), (3L, "y"))
    q.processAllAvailable()
    val metrics = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("ingest")))
    q.stop()
    assert(metrics.nonEmpty, "no observed metrics in progress")
    val last = metrics.last
    assert(last.getAs[Long]("rows_in") === 3L)
    assert(last.getAs[Long]("approx_distinct") === 2L)
  }
}

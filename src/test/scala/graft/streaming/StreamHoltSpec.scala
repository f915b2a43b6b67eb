package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamHolt.{DailyPoint, HoltPoint}

/** transformWithState Holt smoother: per-key (level, trend) state on the
  * integer cent grid must replay the batch fold bit-for-bit across any
  * batch split, and the final state must equal the registered
  * q_holt_linear query on the same sf0.001 daily series. */
class StreamHoltSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val daily: Seq[DailyPoint] = graft.Tables.events(spark, sf)
    .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
    .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
    .select($"event_type", $"day", $"c").as[(String, Long, Long)]
    .collect().toSeq.sortBy(r => (r._2, r._1))
    .map { case (k, d, c) => DailyPoint(k, d, c) }

  private def runStreaming(batches: Seq[Seq[DailyPoint]]): Seq[HoltPoint] = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[DailyPoint]
      val q = StreamHolt.smoothed(input.toDS())
        .writeStream.format("memory").queryName("holt_out")
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table("holt_out").as[HoltPoint].collect().toSeq
          .sortBy(p => (p.key, p.day))
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      prev.foreach(spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      spark.sql("DROP TABLE IF EXISTS holt_out")
    }
  }

  private def finalByKey(pts: Seq[HoltPoint]): Map[String, (Double, Double)] =
    pts.groupBy(_.key).map { case (k, ps) =>
      val last = ps.maxBy(_.day)
      k -> (last.level, last.trend)
    }

  test("one batch: every emitted point replays the batch fold prefix") {
    val got = runStreaming(Seq(daily))
    val byKey = daily.groupBy(_.key)
    byKey.foreach { case (k, pts) =>
      val xs = pts.sortBy(_.day).map(_.cents)
      val emitted = got.filter(_.key == k)
      assert(emitted.size == xs.size)
      xs.indices.foreach { i =>
        val ref = StreamHolt.batchFold(xs.take(i + 1))
        val p = emitted(i)
        assert((p.n_seen, p.level, p.trend) ==
          (ref.n, ref.l / 100.0, ref.b / 100.0), s"$k step $i")
      }
    }
  }

  test("per-day batches equal one big batch (state crosses batches)") {
    val byDay = daily.groupBy(_.day).toSeq.sortBy(_._1).map(_._2)
    assert(runStreaming(byDay) == runStreaming(Seq(daily)))
  }

  test("final state matches the registered q_holt_linear query") {
    val got = finalByKey(runStreaming(Seq(daily)))
    val q = graft.queries.Registry.all.find(_.name == "q_holt_linear").get
      .build(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend"))).toMap
    assert(got == q)
  }
}

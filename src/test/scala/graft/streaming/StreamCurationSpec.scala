package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming curation funnel (round-12 verdict #7): the batch funnel
  * (q_curation_funnel: ingested → language routing → quality rules →
  * exact dedup, with per-stage attrition accounting) wired through
  * `foreachBatch` over a file stream, proven EQUAL to the
  * oracle-certified batch twin — including across a mid-stream restart
  * from the checkpoint.
  *
  * Topology (the production shape for an incremental corpus build):
  * each micro-batch computes its stage flags in one pass, then exact
  * dedup runs as a left-anti join against the persistent SEEN-HASH
  * LEDGER (a parquet table keyed by content hash) — so dedup state is a
  * queryable asset that survives restarts, not opaque operator state.
  * Stage counts append to a stats table keyed by batch_id.
  *
  * Idempotency discipline (what makes foreachBatch exactly-once):
  *  - a batch whose batch_id is already in the stats table is SKIPPED
  *    (re-run after a committed epoch is a no-op);
  *  - the anti-join reads only ledger rows with batch_id < current, so
  *    a torn attempt (ledger appended, stats not) recomputes the same
  *    fresh set instead of anti-joining against its own half-write;
  *  - readers drop duplicate (batch_id, hash) ledger rows, so the torn
  *    attempt's extra files are harmless.
  *
  * Scale: the flags are one embarrassingly parallel pass per batch; the
  * only shuffle is the hash anti-join, which at 100 TB runs against a
  * ledger PARTITIONED BY hash prefix so each batch's probe is
  * partition-pruned; the stats table is one row per batch. No operator
  * state grows with the corpus inside the streaming engine itself.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  private def flags(d: DataFrame): DataFrame = d
    .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
    .withColumn("char_mass", length(col("text")) - (col("n_toks") - 1))
    .withColumn("lang_ok", col("lang") =!= "zh")
    .withColumn("qual_ok", col("lang_ok") && col("n_toks") >= 10 &&
      col("char_mass") <= col("n_toks") * 12)

  test("foreachBatch funnel equals the batch funnel across a restart") {
    val dir = Files.createTempDirectory("graft-cur").toString
    val srcDir = s"$dir/src"
    val seenDir = s"$dir/seen"
    val statsDir = s"$dir/stats"
    val ckpt = s"$dir/ckpt"

    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("lang"), col("text"))

    // six source files → six micro-batches (maxFilesPerTrigger=1)
    def addSlices(range: Range): Unit = {
      range.foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(6)) === i)
          .coalesce(1).write.mode("append").parquet(srcDir)
      }
      Files.list(Paths.get(srcDir)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).map(new java.io.File(_))
        .sortBy(_.lastModified()).zipWithIndex
        .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }
    }

    def curate(batch: DataFrame, batchId: Long): Unit = {
      val s = batch.sparkSession
      val committed =
        if (new java.io.File(statsDir).exists())
          s.read.parquet(statsDir).filter(col("batch_id") === batchId).count() > 0
        else false
      if (committed) return // exactly-once: this epoch already landed
      val f = flags(batch).localCheckpoint(true)
      val qual = f.filter(col("qual_ok"))
        .withColumn("h", sha2(col("text"), 256))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
      // filter STRICTLY-OLDER first, then dedup (round-13 advisor): with
      // dedup first, a hash present under both an older and the current
      // batch_id could keep only the newer row, be filtered away, and
      // re-count as fresh — unreachable under the anti-join-before-append
      // write discipline, but the idempotency invariant shouldn't depend
      // on that ordering
      val seen =
        if (new java.io.File(seenDir).exists())
          s.read.parquet(seenDir)
            .filter(col("batch_id") < batchId).dropDuplicates("h")
        else s.emptyDataFrame.select(lit(0L).as("batch_id"), lit("").as("h"))
          .limit(0)
      val fresh = qual.join(seen.select("h"), Seq("h"), "left_anti")
        .localCheckpoint(true)
      fresh.select(lit(batchId).as("batch_id"), col("h"))
        .write.mode("append").parquet(seenDir)
      val c = f.agg(
        count(lit(1)).as("n0"),
        sum(when(col("lang_ok"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("qual_ok"), 1L).otherwise(0L)).cast("long").as("n2"))
        .collect()(0)
      Seq((batchId, c.getLong(0), c.getLong(1), c.getLong(2), fresh.count()))
        .toDF("batch_id", "n0", "n1", "n2", "n3")
        .write.mode("append").parquet(statsDir)
    }

    def runStream(): Unit = {
      val sch = spark.read.parquet(srcDir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.foreachBatch(curate _)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // ---- phase 1: half the corpus, then a clean stop (mid-stream)
    addSlices(0 until 3)
    runStream()
    val statsMid = spark.read.parquet(statsDir).dropDuplicates("batch_id")
    assert(statsMid.count() === 3, "three micro-batches before the restart")

    // ---- phase 2: restart from the checkpoint with the rest of the data
    addSlices(3 until 6)
    runStream()

    // ---- streamed stage table: sum per-batch counts
    val stats = spark.read.parquet(statsDir).dropDuplicates("batch_id")
    assert(stats.count() === 6, "no epoch re-ran after the restart")
    val tot = stats.agg(sum("n0").as("n0"), sum("n1").as("n1"),
      sum("n2").as("n2"), sum("n3").as("n3")).collect()(0)
    val streamed = Map(
      "0_ingested" -> tot.getLong(0), "1_lang_route" -> tot.getLong(1),
      "2_quality_rules" -> tot.getLong(2), "3_exact_dedup" -> tot.getLong(3))

    // ---- batch twin: the ORACLE-CERTIFIED q_curation_funnel stage table
    val funnel = graft.queries.Registry.all
      .find(_.name == "q_curation_funnel").get.build(spark, SfDir)
      .select("stage", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === funnel,
      s"stream stage table $streamed != batch $funnel")

    // ---- and the dedup ledger is exactly the batch-side distinct-hash set
    val ledger = spark.read.parquet(seenDir)
      .select("h").distinct().as[String].collect().toSet
    val batchHashes = flags(docs).filter(col("qual_ok"))
      .select(sha2(col("text"), 256).as("h"))
      .distinct().as[String].collect().toSet
    assert(ledger === batchHashes, "ledger != batch distinct hashes")
  }
}

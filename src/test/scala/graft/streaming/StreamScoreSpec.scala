package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import graft.scoring.ScorePipeline
import graft.sources.Upsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming scoring lifecycle (round-13 verdict #8): the batch flagship
  * `q_full_scores` maintained over an EVENTS FILE STREAM via foreachBatch
  * + the upsert sink, proven EQUAL to the oracle-certified batch DAG —
  * including across a mid-stream restart from the checkpoint (the
  * StreamCurationSpec discipline).
  *
  * Topology (the production shape): the only corpus-sized pass in the
  * scoring DAG is its root aggregate, and that aggregate is MERGEABLE —
  * `ScorePipeline.dimPartials` is a per-(entity, dimension) integer-cent
  * sum + count, so each micro-batch appends its partial rows to a
  * persistent PARTIALS LEDGER keyed by batch_id, and re-aggregating the
  * ledger is bit-identical to aggregating the full event table (long
  * sums are order-free — the integer-grid discipline is what makes
  * stream ≡ batch EXACT, not approximate). The downstream chain
  * (VR → penalties → synergy → percentile → SEM) is entity-count-sized,
  * never event-sized, so each refresh recomputes it from the ledger and
  * MERGEs the result into the org_air_scores table with
  * `Upsert.lastWins` (the reference's MERGE sink, S9).
  *
  * Idempotency discipline (what makes foreachBatch exactly-once):
  *  - a batch whose batch_id is already in the commit table is SKIPPED;
  *  - the commit marker is written AFTER the partials, so a torn attempt
  *    re-appends byte-identical partial rows that the reader's
  *    dropDuplicates((batch_id, entity_id, dimension)) collapses;
  *  - score refreshes carry a version (= committed-batch count), so the
  *    upsert's last-wins order is deterministic across replays.
  *
  * Scale: the per-batch work is one map-side-combined agg over the batch
  * plus an append; no operator state grows inside the streaming engine.
  * At 100 TB the ledger compacts periodically (re-aggregate committed
  * partials into one snapshot row per key — same long-sum algebra), and
  * the refresh cost is bounded by ENTITY count, not event count.
  */
class StreamScoreSpec extends SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  test("foreachBatch-maintained org_air_scores equals batch q_full_scores across a restart") {
    val dir = Files.createTempDirectory("graft-score").toString
    val srcDir = s"$dir/src"
    val partDir = s"$dir/partials"
    val commitDir = s"$dir/commits"
    val scoresDir = s"$dir/scores"
    val ckpt = s"$dir/ckpt"

    val events = Tables.events(spark, SfDir)
      .select("event_id", "user_id", "event_type", "value")

    // six source files → six micro-batches (maxFilesPerTrigger=1)
    def addSlices(range: Range): Unit = {
      range.foreach { i =>
        events.filter(pmod(col("event_id"), lit(6)) === i)
          .coalesce(1).write.mode("append").parquet(srcDir)
      }
      Files.list(Paths.get(srcDir)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).map(new java.io.File(_))
        .sortBy(_.lastModified()).zipWithIndex
        .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }
    }

    def maintain(batch: DataFrame, batchId: Long): Unit = {
      val s = batch.sparkSession
      val committed =
        if (Upsert.pathExists(s, commitDir))
          s.read.parquet(commitDir).filter(col("batch_id") === batchId).count() > 0
        else false
      if (committed) return // exactly-once: this epoch already landed
      val partial = ScorePipeline.dimPartials(batch)
        .withColumn("batch_id", lit(batchId))
        .localCheckpoint(true)
      partial.write.mode("append").parquet(partDir)
      // commit marker LAST: a torn attempt replays into identical rows
      Seq((batchId, partial.count())).toDF("batch_id", "n_keys")
        .write.mode("append").parquet(commitDir)
    }

    /** Re-aggregate the committed ledger, run the entity-sized scoring
      * chain, and MERGE into org_air_scores (the upsert sink). */
    def refreshScores(): Unit = {
      val commits = spark.read.parquet(commitDir)
        .select("batch_id").distinct()
      // refresh version = highest committed epoch + 1: monotonic across
      // a ledger COMPACTION (which replaces many epochs with one snapshot
      // epoch carrying a higher id) — a count-based version would move
      // BACKWARD after compaction and lose the upsert's last-wins order
      val ver = commits.agg(max("batch_id")).collect()(0).getLong(0) + 1
      val partials = spark.read.parquet(partDir)
        .dropDuplicates("batch_id", "entity_id", "dimension")
        .join(commits, Seq("batch_id")) // torn half-writes never score
        .groupBy("entity_id", "dimension")
        .agg(sum("cents").as("cents"), sum("n").as("n"))
      val scores = ScorePipeline
        .fullScoresFrom(spark, ScorePipeline.dimsFromPartials(partials))
        .withColumn("ver", lit(ver))
      val base =
        if (Upsert.pathExists(spark, scoresDir)) spark.read.parquet(scoresDir)
        else scores.limit(0)
      val merged = Upsert
        .lastWins(base, scores, Seq("entity_id"), Seq("ver"))
        .localCheckpoint(true) // reading + overwriting the same path
      merged.write.mode("overwrite").parquet(scoresDir)
    }

    def runStream(): Unit = {
      val sch = spark.read.parquet(srcDir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.foreachBatch(maintain _)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // ---- phase 1: half the event stream, a refresh, then a clean stop
    addSlices(0 until 3)
    runStream()
    refreshScores()
    val mid = spark.read.parquet(scoresDir)
    assert(mid.agg(max("ver")).collect()(0).getLong(0) === 3L)
    assert(mid.count() > 0, "mid-stream refresh produced scores")

    // ---- phase 2: restart from the checkpoint with the rest of the data
    addSlices(3 until 6)
    runStream()
    refreshScores()

    val commits = spark.read.parquet(commitDir).dropDuplicates("batch_id")
    assert(commits.count() === 6, "no epoch re-ran after the restart")

    // ---- the maintained table IS the batch flagship ON THE CERTIFIED
    // SURFACE: the q_full_scores oracle certifies the 1e-4 output grid
    // (its QueryDef drounds every float column), and that grid is the
    // right equality here too — the ledger's re-aggregation gives
    // bit-identical dims (long sums), but the corpus-level Pearson ρ in
    // the SEM step is a double reduction whose partial-agg order differs
    // with the ledger's partitioning (~1e-13 relative), exactly the ulp
    // class the output grid exists to absorb
    import graft.queries.Det.dround
    def certified(df: DataFrame): DataFrame = df.select(
      col("entity_id"),
      dround(col("composite_score"), 4).as("composite_score"),
      dround(col("tc"), 4).as("tc"),
      dround(col("risk_adjustment"), 4).as("risk_adjustment"),
      col("jobs_count"),
      dround(col("prior_weight"), 4).as("prior_weight"),
      dround(col("vr_blended"), 4).as("vr_blended"),
      dround(col("final_score"), 4).as("final_score"),
      dround(col("sem"), 4).as("sem"),
      dround(col("ci_lower"), 4).as("ci_lower"),
      dround(col("ci_upper"), 4).as("ci_upper"),
      col("final_band"))
    val streamed = spark.read.parquet(scoresDir).drop("ver")
    val batch = ScorePipeline.fullScores(spark, SfDir)
    val a = certified(streamed).orderBy("entity_id").collect().toSeq
    val b = certified(batch).orderBy("entity_id").collect().toSeq
    assert(a.size === b.size, s"row counts: streamed ${a.size} vs batch ${b.size}")
    a.zip(b).foreach { case (x, y) =>
      assert(x === y, s"row mismatch: streamed $x vs batch $y")
    }
    // every entity's final row came from the FINAL refresh (the upsert
    // replaced every mid-stream ver=3 row)
    assert(spark.read.parquet(scoresDir)
      .filter(col("ver") =!= 6L).count() === 0L)

    // ---- ledger compaction (the 100 TB maintenance step the scaladoc
    // claims): re-aggregate all committed partials into ONE snapshot row
    // per key under a single higher epoch — the same long-sum algebra,
    // so a refresh from the compacted ledger must reproduce the scores
    // exactly, and the ledger shrinks to |keys| rows
    val SnapEpoch = 1000L
    val commits2 = spark.read.parquet(commitDir).select("batch_id").distinct()
    val preRows = spark.read.parquet(partDir).count()
    val snapshot = spark.read.parquet(partDir)
      .dropDuplicates("batch_id", "entity_id", "dimension")
      .join(commits2, Seq("batch_id"))
      .groupBy("entity_id", "dimension")
      .agg(sum("cents").as("cents"), sum("n").as("n"))
      .withColumn("batch_id", lit(SnapEpoch))
      .localCheckpoint(true)
    snapshot.write.mode("overwrite").parquet(partDir)
    Seq((SnapEpoch, snapshot.count())).toDF("batch_id", "n_keys")
      .write.mode("overwrite").parquet(commitDir)
    refreshScores()
    val compacted = spark.read.parquet(scoresDir)
    assert(compacted.filter(col("ver") =!= (SnapEpoch + 1)).count() === 0L,
      "compaction refresh must supersede every pre-compaction row")
    val c = certified(compacted.drop("ver")).orderBy("entity_id").collect().toSeq
    assert(c === b, "scores from the compacted ledger diverged from batch")
    assert(spark.read.parquet(partDir).count() < preRows,
      "compaction must shrink the ledger")
  }
}

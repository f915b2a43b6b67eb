package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q_incremental_triangles: edges arrive in
  * micro-batches over a file stream, and the triangle count is
  * maintained PER BATCH with the first-delta-slot decomposition
  * (t1 = D vs U,U; t2 = B,D vs U; t3 = B,B closed by D — B = the
  * persistent edge ledger, D = the batch's genuinely-new edges), in the
  * same edge-iterator form as the batch query (adjacency-array
  * intersections, no wedge shuffle). The accumulated count must equal a
  * full wedge-closure recompute over the final edge set — the
  * incremental algebra certified in its actual deployment topology,
  * where the base wedge mass is NEVER re-enumerated per update.
  *
  * Round 13 (verdict #8): a second case kills the stream MID-RUN and
  * resumes from the checkpoint (the StreamCurationSpec discipline) — the
  * ledger anti-join plus a committed-epoch guard must make the restart
  * path land the identical total.
  */
class StreamIncrementalTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  /** Canonical urgent-order co-occurrence edges (a < b). */
  private lazy val edges: DataFrame = {
    val li = Tables.lineitem(spark, SfDir)
      .join(Tables.orders(spark, SfDir)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .localCheckpoint(true)
  }

  private def writeSlice(srcDir: String, slice: Int): Unit =
    edges.filter(pmod(col("a") * 31 + col("b"), lit(4)) === slice)
      .coalesce(1).write.mode("append").parquet(srcDir)

  /** Stamp source files with ascending mtimes so the file stream's batch
    * order is deterministic. */
  private def stampOrder(srcDir: String): Unit =
    Files.list(Paths.get(srcDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).map(new java.io.File(_))
      .sortBy(f => (f.lastModified(), f.getName)).zipWithIndex
      .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }

  private def succ(ed: DataFrame): DataFrame = ed.groupBy(col("a").as("n"))
    .agg(sort_array(collect_list(col("b"))).as("arr"))
  private def pred(ed: DataFrame): DataFrame = ed.groupBy(col("b").as("n"))
    .agg(sort_array(collect_list(col("a"))).as("arr"))
  private def sumIsect(edges: DataFrame, left: DataFrame, right: DataFrame): Long =
    edges
      .join(left.select(col("n").as("la"), col("arr").as("na")),
        col("a") === col("la"))
      .join(right.select(col("n").as("rb"), col("arr").as("nb")),
        col("b") === col("rb"))
      .agg(coalesce(sum(size(array_intersect(col("na"), col("nb")))
        .cast("long")), lit(0L)))
      .collect()(0).getLong(0)

  /** The per-batch maintenance step: anti-join the ledger for the true
    * delta, add the three first-delta-slot terms, append delta + stats.
    * `guardCommitted` replays the StreamCurationSpec exactly-once
    * discipline — a restarted epoch that already landed must be a no-op
    * (foreachBatch re-delivers the last uncommitted epoch on resume). */
  private def mkUpdate(ledgerDir: String, countDir: String,
      guardCommitted: Boolean): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val s = batch.sparkSession
      val committed = guardCommitted &&
        new java.io.File(countDir).exists() &&
        s.read.parquet(countDir).filter(col("batch_id") === batchId).count() > 0
      if (!committed) {
        val d0 = batch.select("a", "b").distinct()
        val base =
          if (new java.io.File(ledgerDir).exists())
            s.read.parquet(ledgerDir).select("a", "b")
          else d0.limit(0)
        val delta = d0.join(base, Seq("a", "b"), "left_anti")
          .localCheckpoint(true)
        val u = base.unionByName(delta)
        val inc = sumIsect(delta, succ(u), succ(u)) +
          sumIsect(base, succ(u), succ(delta)) +
          sumIsect(delta, succ(base), pred(base))
        delta.write.mode("append").parquet(ledgerDir)
        Seq((batchId, delta.count(), inc)).toDF("batch_id", "n_new_edges", "inc")
          .write.mode("append").parquet(countDir)
      }
    }

  private def runStream(srcDir: String, ckptDir: String,
      update: (DataFrame, Long) => Unit): Unit = {
    val sch = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch(update)
      .option("checkpointLocation", ckptDir)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Full wedge-closure recompute over the final ledger — a DIFFERENT
    * algorithm than the maintenance path, deliberately. */
  private def fullRecount(ledgerDir: String): Long = {
    val led = spark.read.parquet(ledgerDir)
    led.as("e1").join(led.as("e2"), col("e1.b") === col("e2.a"))
      .join(led.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .count()
  }

  test("foreachBatch delta maintenance equals the full recompute") {
    val dir = Files.createTempDirectory("graft-stri").toString
    val srcDir = s"$dir/src"

    // four source files → four micro-batches; a fifth file REPLAYS slice
    // 0 so the ledger anti-join's idempotence is exercised (duplicate
    // edge arrivals must contribute zero new triangles)
    (0 to 3).foreach(writeSlice(srcDir, _))
    writeSlice(srcDir, 0)
    stampOrder(srcDir)

    runStream(srcDir, s"$dir/ckpt",
      mkUpdate(s"$dir/ledger", s"$dir/counts", guardCommitted = false))

    val counts = spark.read.parquet(s"$dir/counts")
    assert(counts.count() === 5, "five micro-batches")
    val replay = counts.orderBy(col("batch_id").desc).first()
    assert(replay.getLong(1) === 0L && replay.getLong(2) === 0L,
      "the replayed slice must add zero edges and zero triangles")
    val total = counts.agg(sum("inc")).collect()(0).getLong(0)
    assert(total === fullRecount(s"$dir/ledger"),
      s"incremental total $total != full recompute")
    assert(spark.read.parquet(s"$dir/ledger").count() === edges.count(),
      "ledger holds exactly the edge set")
  }

  test("mid-stream restart resumes from the checkpoint to the same total") {
    val dir = Files.createTempDirectory("graft-stri-rs").toString
    val srcDir = s"$dir/src"
    val update = mkUpdate(s"$dir/ledger", s"$dir/counts",
      guardCommitted = true)

    // phase 1: two slices arrive, the stream processes them, then DIES
    writeSlice(srcDir, 0)
    writeSlice(srcDir, 1)
    stampOrder(srcDir)
    runStream(srcDir, s"$dir/ckpt", update)
    val mid = spark.read.parquet(s"$dir/counts")
    assert(mid.count() === 2, "two epochs committed before the kill")

    // phase 2: the remaining slices (plus a replay of slice 0) land while
    // the stream is down; a NEW query resumes from the same checkpoint
    writeSlice(srcDir, 2)
    writeSlice(srcDir, 3)
    writeSlice(srcDir, 0)
    stampOrder(srcDir)
    runStream(srcDir, s"$dir/ckpt", update)

    val counts = spark.read.parquet(s"$dir/counts")
    assert(counts.select("batch_id").distinct().count() === counts.count(),
      "the committed-epoch guard admits each epoch once")
    val total = counts.agg(sum("inc")).collect()(0).getLong(0)
    assert(total === fullRecount(s"$dir/ledger"),
      s"restarted incremental total $total != full recompute")
    assert(spark.read.parquet(s"$dir/ledger").count() === edges.count(),
      "ledger holds exactly the edge set after restart")
  }
}

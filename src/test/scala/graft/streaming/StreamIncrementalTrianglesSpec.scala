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
  */
class StreamIncrementalTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  test("foreachBatch delta maintenance equals the full recompute") {
    val dir = Files.createTempDirectory("graft-stri").toString
    val srcDir = s"$dir/src"
    val ledgerDir = s"$dir/ledger"
    val countDir = s"$dir/counts"

    val li = Tables.lineitem(spark, SfDir)
      .join(Tables.orders(spark, SfDir)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .localCheckpoint(true)

    // four source files → four micro-batches; a fifth file REPLAYS slice
    // 0 so the ledger anti-join's idempotence is exercised (duplicate
    // edge arrivals must contribute zero new triangles)
    (0 to 3).foreach { i =>
      e.filter(pmod(col("a") * 31 + col("b"), lit(4)) === i)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    e.filter(pmod(col("a") * 31 + col("b"), lit(4)) === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    Files.list(Paths.get(srcDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).map(new java.io.File(_))
      .sortBy(_.lastModified()).zipWithIndex
      .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }

    def succ(ed: DataFrame): DataFrame = ed.groupBy(col("a").as("n"))
      .agg(sort_array(collect_list(col("b"))).as("arr"))
    def pred(ed: DataFrame): DataFrame = ed.groupBy(col("b").as("n"))
      .agg(sort_array(collect_list(col("a"))).as("arr"))
    def sumIsect(edges: DataFrame, left: DataFrame, right: DataFrame): Long =
      edges
        .join(left.select(col("n").as("la"), col("arr").as("na")),
          col("a") === col("la"))
        .join(right.select(col("n").as("rb"), col("arr").as("nb")),
          col("b") === col("rb"))
        .agg(coalesce(sum(size(array_intersect(col("na"), col("nb")))
          .cast("long")), lit(0L)))
        .collect()(0).getLong(0)

    def update(batch: DataFrame, batchId: Long): Unit = {
      val s = batch.sparkSession
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

    val sch = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch(update _)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()

    val counts = spark.read.parquet(countDir)
    assert(counts.count() === 5, "five micro-batches")
    val replay = counts.orderBy(col("batch_id").desc).first()
    assert(replay.getLong(1) === 0L && replay.getLong(2) === 0L,
      "the replayed slice must add zero edges and zero triangles")
    val total = counts.agg(sum("inc")).collect()(0).getLong(0)

    // full recompute over the final ledger (wedge-closure form — a
    // DIFFERENT algorithm than the maintenance path, deliberately)
    val led = spark.read.parquet(ledgerDir)
    val expected = led.as("e1").join(led.as("e2"), col("e1.b") === col("e2.a"))
      .join(led.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .count()
    assert(total === expected,
      s"incremental total $total != full recompute $expected")
    assert(led.count() === e.count(), "ledger holds exactly the edge set")
  }
}

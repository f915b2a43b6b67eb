package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Bloom-gated streaming ingest: exact cross-batch idempotency (same
  * contract as dedupedForeachBatch) with the persisted-filter screen, plus
  * the staleness-repair protocol (store is truth, filter is derived). */
class StreamBloomGateSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(dir: String, numBits: Int = 1 << 10)(
      batches: Seq[Seq[(Long, String)]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = StreamIngest.withIngestMeta(
      mem.toDF().toDF("id", "payload"), Seq("payload"))
    val q = StreamIngest.bloomGatedForeachBatch(
      stream, s"$dir/store", s"$dir/filter.bloom", s"$dir/ckpt-${batches.size}-${System.identityHashCode(batches)}", "id",
      numBits = numBits, numHashes = 5).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
  }

  test("cross-batch duplicate hashes are dropped exactly (bloom path ≡ " +
      "exact gate), first-by-order row survives") {
    val dir = Files.createTempDirectory("graft-bloomgate").toString
    runBatches(dir)(Seq(
      Seq((1L, "a"), (2L, "b"), (3L, "b")), // in-batch dup
      Seq((4L, "b"), (5L, "c")), // cross-batch dup
      Seq((6L, "c"), (7L, "d")))) // dup against batch-2 content
    val stored = spark.read.parquet(s"$dir/store")
    assert(stored.count() === 4)
    assert(stored.select("payload").as[String].collect().sorted.toSeq ===
      Seq("a", "b", "c", "d"))
    assert(stored.filter($"payload" === "b").select("id").as[Long]
      .collect().head === 2L)
    // the persisted filter's stamp covers the full store
    val f = Files.readAllBytes(Paths.get(s"$dir/filter.bloom"))
    val stamp = java.nio.ByteBuffer.wrap(f, f.length - 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(stamp === 4L)
  }

  test("stale filter (simulated lost update) is detected by stamp and " +
      "rebuilt — a store hash can never probe definitely-new") {
    val dir = Files.createTempDirectory("graft-bloomstale").toString
    runBatches(dir)(Seq(Seq((1L, "a"), (2L, "b"))))
    // simulate a crash AFTER store append, BEFORE filter write: stamp the
    // existing filter with a count that no longer matches the store
    val p = Paths.get(s"$dir/filter.bloom")
    val bytes = Files.readAllBytes(p)
    java.nio.ByteBuffer.wrap(bytes, bytes.length - 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(1L) // store has 2
    // also zero the bit region so a NON-rebuilt filter would miss "b"
    java.util.Arrays.fill(bytes, 8, bytes.length - 8, 0.toByte)
    Files.write(p, bytes)
    runBatches(dir)(Seq(Seq((9L, "b"), (10L, "e")))) // "b" is a store dup
    val stored = spark.read.parquet(s"$dir/store")
    assert(stored.count() === 3) // a, b (original), e — dup still dropped
    assert(stored.filter($"payload" === "b").select("id").as[Long]
      .collect().toSeq === Seq(2L))
  }

  test("restart with a different filter geometry (numBits) rebuilds " +
      "instead of trusting or OR-ing mismatched bits") {
    val dir = Files.createTempDirectory("graft-bloomgeom").toString
    runBatches(dir, numBits = 1 << 10)(Seq(Seq((1L, "a"), (2L, "b"))))
    // restart the pipeline with a larger filter: the old-geometry file
    // must be detected (header check) and rebuilt from the store, so the
    // store duplicate "b" is still dropped
    runBatches(dir, numBits = 1 << 12)(Seq(Seq((9L, "b"), (10L, "z"))))
    val stored = spark.read.parquet(s"$dir/store")
    assert(stored.count() === 3) // a, b(original), z
    assert(stored.filter($"payload" === "b").select("id").as[Long]
      .collect().toSeq === Seq(2L))
    // and the persisted filter now carries the NEW geometry
    val f = Files.readAllBytes(Paths.get(s"$dir/filter.bloom"))
    assert(org.apache.spark.sql.graft.BloomBits.readIntLE(f, 0) === (1 << 12))
  }

  test("loadOrRebuildFilter round-trips: fresh rebuild equals the " +
      "incrementally maintained filter for the same store") {
    val dir = Files.createTempDirectory("graft-bloomrt").toString
    runBatches(dir)(Seq(
      Seq((1L, "p"), (2L, "q")),
      Seq((3L, "r"))))
    val maintained = {
      val all = Files.readAllBytes(Paths.get(s"$dir/filter.bloom"))
      java.util.Arrays.copyOf(all, all.length - 8)
    }
    Files.delete(Paths.get(s"$dir/filter.bloom"))
    val rebuilt = StreamIngest.loadOrRebuildFilter(spark,
      spark.read.parquet(s"$dir/store"), s"$dir/filter.bloom",
      numBits = 1 << 10, numHashes = 5)
    assert(rebuilt.sameElements(maintained))
  }
}

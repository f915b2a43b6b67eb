package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Store compaction: file count drops to the size target, rows and
  * content survive byte-identically, and schema-evolved stores read back
  * merged. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def contentHash(path: String): String =
    spark.read.parquet(path)
      .select(sha2(concat_ws("§", col("id").cast("string"),
        col("payload")), 256).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long")).as("s"))
      .head().getLong(0).toString

  test("compaction preserves rows and content while collapsing the " +
      "file count") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val store = s"$dir/store"
    // simulate many tiny micro-batch appends
    (0 until 12).foreach { b =>
      (0 until 50).map(i => (b * 50L + i, s"payload-$b-$i"))
        .toDF("id", "payload")
        .repartition(3)
        .write.mode("append").parquet(store)
    }
    val rowsBefore = spark.read.parquet(store).count()
    val hashBefore = contentHash(store)

    val (nBefore, nAfter) = Compact.compactStore(spark, store,
      targetBytes = 1L * 1024 * 1024)
    assert(nBefore >= 12, s"expected many small files, got $nBefore")
    assert(nAfter < nBefore, s"no collapse: $nBefore -> $nAfter")
    assert(nAfter === 1, s"1 MiB target over tiny data → one file, got $nAfter")

    assert(spark.read.parquet(store).count() === rowsBefore)
    assert(contentHash(store) === hashBefore)
  }

  test("partitioned store compaction preserves layout, rows, content " +
      "and partition pruning") {
    val dir = Files.createTempDirectory("graft-compact-part").toString
    val store = s"$dir/store"
    // many tiny micro-batch appends into a 2-level Hive layout
    (0 until 8).foreach { b =>
      (0 until 40).map { i =>
        val lang = if ((b + i) % 2 == 0) "en" else "fr"
        (b * 40L + i, s"payload-$b-$i", lang, b % 2)
      }.toDF("id", "payload", "lang", "shard")
        .repartition(2)
        .write.mode("append").partitionBy("lang", "shard").parquet(store)
    }
    val rowsBefore = spark.read.parquet(store).count()
    val hashBefore = contentHash(store)

    val (nBefore, nAfter) = Compact.compactPartitionedStore(spark, store,
      targetBytes = 1L * 1024 * 1024, concurrency = 2)
    assert(nBefore > nAfter, s"no collapse: $nBefore -> $nAfter")
    assert(nAfter === 4, s"4 leaf partitions at 1 MiB target → 4 files, got $nAfter")

    // rows, content, and the partition COLUMNS all survive
    val after = spark.read.parquet(store)
    assert(after.count() === rowsBefore)
    assert(contentHash(store) === hashBefore)
    assert(after.columns.sorted.toSeq === Seq("id", "lang", "payload", "shard"))

    // partition pruning still works: a lang filter must reach the scan
    // as a partition filter, not a data filter over the whole store
    val plan = after.filter($"lang" === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter did not prune partitions:\n${plan.take(1500)}")
    assert(after.filter($"lang" === "en").count() ===
      spark.read.parquet(store).filter($"lang" === "en").count())

    // flat compactStore still refuses the partitioned layout loudly
    val err = intercept[IllegalArgumentException] {
      Compact.compactStore(spark, store, targetBytes = 1L * 1024 * 1024)
    }
    assert(err.getMessage.contains("partition subdirectories"))
  }

  test("schema-evolved appends read back merged (new column null for " +
      "old rows) and survive compaction") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    val store = s"$dir/store"
    Seq((1L, "a")).toDF("id", "payload")
      .write.mode("append").parquet(store)
    Seq((2L, "b", "en")).toDF("id", "payload", "lang")
      .write.mode("append").parquet(store)

    val merged = spark.read.option("mergeSchema", "true").parquet(store)
    assert(merged.columns.sorted.toSeq === Seq("id", "lang", "payload"))
    assert(merged.filter($"id" === 1L).select("lang").head().isNullAt(0))
    assert(merged.filter($"id" === 2L).select("lang").as[String].head() === "en")

    // compaction must carry the evolved column (its read merges schemas —
    // a first-file-schema read would silently drop lang from every row)
    Compact.compactStore(spark, store, targetBytes = 1L * 1024 * 1024)
    val after = spark.read.parquet(store)
    assert(after.columns.sorted.toSeq === Seq("id", "lang", "payload"))
    assert(after.filter($"id" === 2L).select("lang").as[String].head() === "en")
    assert(after.count() === 2)
  }
}

package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Write-path posture (S-family sinks at scale): a curated corpus lands
  * partitioned by its read key so downstream queries get PARTITION PRUNING —
  * a `lang = 'en'` scan must touch only the en directory, proven here by the
  * PartitionFilters entry in the physical plan and by the pruned scan's
  * row count. `repartition(col)` before `partitionBy` keeps the file count
  * at one-file-per-partition-dir-per-task instead of (tasks × partitions)
  * fragmentation — the 100 TB small-files guard.
  */
class WriterSpec extends SparkSpec {

  test("partitionBy layout: pruned scan + partition filters + no fragmentation") {
    val out = Files.createTempDirectory("graft-writer").toString + "/docs"
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    d.repartition(col("lang"))
      .sortWithinPartitions("doc_id")
      .write.partitionBy("lang").parquet(out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    val langs = d.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(dirs === langs.map("lang=" + _), s"partition dirs: $dirs")
    // ≤1 data file per partition dir (hash repartition puts each lang in
    // one task; a stray empty task adds no file)
    dirs.foreach { dir =>
      val files = new java.io.File(s"$out/$dir").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$dir fragmented: ${files.length} files")
    }

    val back = spark.read.parquet(out)
    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning:\n${plan.take(2000)}")
    val enCount = d.filter(col("lang") === "en").count()
    assert(pruned.count() === enCount)
    assert(back.count() === d.count())
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-files compaction for an append-only parquet store — the
  * maintenance half of every streaming ingest (each micro-batch append
  * leaves one-or-more small files; a year of 1-minute batches is ~500k
  * files whose listing/footer overhead eventually dominates scan time at
  * any scale, let alone 100 TB).
  *
  * Strategy: size-targeted repartition (total bytes / targetBytes,
  * clamped to ≥1) and rewrite to a temp directory, then an atomic-ish
  * directory swap (rename old → trash, temp → live, delete trash). The
  * swap is the same pattern warehouse table formats implement with
  * manifests; on plain parquet directories the exposure window is the
  * instant between the two renames, and a crash mid-swap leaves either
  * the old or the new directory complete — never a mix (reference analog:
  * the artifact store rewrite in the ingest pipeline).
  *
  * Row-level guarantee: the rewrite is a pure repartition — COUNT and
  * content are byte-identical (CompactSpec asserts row parity and a
  * full-column hash match across the swap).
  */
object Compact {

  /** Compact `storePath` so each output file targets `targetBytes`.
    * Returns (filesBefore, filesAfter). */
  def compactStore(spark: SparkSession, storePath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes >= 1024, s"targetBytes too small: $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(conf)

    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.filter { st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")
      }

    // Flat-directory stores only: a Hive-partitioned layout would list 0
    // top-level bytes (forcing a single-task rewrite) and the rewrite
    // would silently discard the partition directories. Fail loudly
    // instead of corrupting layout; partition-preserving compaction is a
    // per-partition-directory call of this same function.
    val subdirs = fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
    require(subdirs.isEmpty,
      s"compactStore handles flat parquet directories only; $storePath has " +
        s"partition subdirectories: ${subdirs.map(_.getPath.getName).take(3).mkString(", ")}")
    val before = dataFiles(path)
    require(before.nonEmpty, s"compactStore: no data files under $storePath")
    val totalBytes = before.map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(storePath + ".compact-tmp")
    val trash = new org.apache.hadoop.fs.Path(storePath + ".compact-old")
    fs.delete(tmp, true)
    fs.delete(trash, true)

    // mergeSchema: an append-only store accretes columns over time; a
    // compaction read using one file's schema would silently DROP the
    // evolved columns from every rewritten row
    // No explicit sort: round-robin repartition already local-sorts rows
    // before distributing (spark.sql.execution.sortBeforeRepartition,
    // default true) exactly so task retries redistribute identically.
    // (A sortWithinPartitions(spark_partition_id()) here — constant
    // within every partition — imposed no ordering at all.)
    spark.read.option("mergeSchema", "true").parquet(storePath)
      .repartition(parts)
      .write.parquet(tmp.toString)

    // swap: live → trash, tmp → live, drop trash
    if (!fs.rename(path, trash)) {
      throw new java.io.IOException(s"compact swap: rename $path -> $trash failed")
    }
    if (!fs.rename(tmp, path)) {
      // restore the original before failing — never leave the store missing
      fs.rename(trash, path)
      throw new java.io.IOException(s"compact swap: rename $tmp -> $path failed")
    }
    fs.delete(trash, true)

    (before.size, dataFiles(path).size)
  }
}

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

  /** Partition-preserving compaction for a Hive-layout store
    * (`store/key=v1/key2=v2/part-*.parquet`): walks to the leaf
    * partition directories and compacts EACH ONE with [[compactStore]],
    * so the directory structure — and with it partition discovery and
    * partition PRUNING on reads — survives byte-identically. A whole-
    * store `read.parquet().repartition().write` would have to re-derive
    * the layout with partitionBy (reshuffling every row by partition
    * key); per-leaf rewrite touches only each leaf's own rows, which is
    * the only shape that scales to a 100 TB store where one day's
    * partitions need compacting and the other 10,000 must not be read
    * at all.
    *
    * Leaves already at one file are skipped (already compact — a
    * rewrite would only churn bytes). Leaf rewrites are independent
    * Spark jobs, submitted `concurrency` at a time from a bounded pool
    * (Spark's scheduler interleaves them; the swap in compactStore is
    * per-leaf, so concurrent leaves never touch the same directory).
    *
    * Returns (filesBefore, filesAfter) summed over all leaves. */
  def compactPartitionedStore(spark: SparkSession, storePath: String,
      targetBytes: Long = 128L * 1024 * 1024,
      concurrency: Int = 4): (Int, Int) = {
    require(concurrency >= 1, s"concurrency must be >= 1, got $concurrency")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(conf)

    def visible(st: org.apache.hadoop.fs.FileStatus): Boolean = {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val st = fs.listStatus(p).toSeq.filter(visible)
      val dirs = st.filter(_.isDirectory)
      val files = st.filter(_.isFile)
      // Hive layout never mixes data files with partition directories at
      // one level — refuse rather than guess which half to compact
      require(dirs.isEmpty || files.isEmpty,
        s"mixed files and directories under $p — not a Hive-layout store")
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(d => leaves(d.getPath))
    }
    val leafDirs = leaves(root).filterNot(_ == root)
    require(leafDirs.nonEmpty,
      s"compactPartitionedStore: no partition directories under $storePath" +
        " (use compactStore for flat stores)")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(concurrency, leafDirs.size))
    try {
      val futs = leafDirs.map { leaf =>
        pool.submit(new java.util.concurrent.Callable[(Int, Int)] {
          def call(): (Int, Int) = {
            val n = fs.listStatus(leaf).count(st => st.isFile && visible(st))
            if (n <= 1) (n, n) // already compact
            else compactStore(spark, leaf.toString, targetBytes)
          }
        })
      }
      futs.map(_.get()).foldLeft((0, 0)) { case ((b, a), (lb, la)) =>
        (b + lb, a + la)
      }
    } finally pool.shutdown()
  }
}

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Spill certification (round-11 verdict #5): run the shuffle-heavy
  * queries under a DELIBERATELY small heap and prove the plans SPILL
  * instead of OOM-ing. The 128 GiB sandbox has never been the binding
  * constraint; a real cluster's per-executor memory (a few GiB per task
  * slot) will be — a plan that only completes because execution memory
  * happened to be abundant is not a 100 TB plan.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=4g SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.SpillProbe <sfDir> <query...>"
  *
  * The heap bound comes from the forked JVM's -Xmx (build.sbt wires
  * SPARK_DRIVER_MEM into javaOptions); this main just reports it. Per
  * query it prints wall seconds plus the executor task metrics that
  * certify the memory behavior: unified-memory spill (memoryBytesSpilled
  * — bytes that left execution memory for the spill path), disk spill
  * (diskBytesSpilled — what actually hit disk after compression), and
  * peak execution memory across tasks. A query that finishes with
  * nonzero spill under the small heap is CERTIFIED spill-safe: Spark's
  * sort/aggregate/join operators degraded to their external (disk)
  * variants instead of dying. A query with zero spill that still
  * finishes simply fit — also fine, reported as such.
  *
  * Output: one `[spill] …` line per query (stderr mirrors progress), and
  * a final single-line JSON summary on stdout.
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: SpillProbe <sfDir> [query...]")
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Partition sizing is PART OF what this probe certifies. A small heap
    // demands per-task working sets sized to it — the same two knobs a
    // real memory-constrained cluster sets, applied here instead of the
    // bench default (shuffle.partitions = cores, maxPartitionBytes 128m):
    //   - shuffle partitions at 8× cores, so a reduce-side sort/agg holds
    //     1/64th of the shuffle, not 1/8th;
    //   - scan splits at 32 MB of PARQUET, because decoded size is what
    //     hits memory: a 128 MB split of delta-encoded int64 columns
    //     decodes to >30M rows, and the map-side shuffle sorter's pointer
    //     array for such a task is a single ~268 MB long[] — a humongous
    //     allocation that OOMs a 4g G1 heap before the (accounted) pool
    //     would have told it to spill. Measured: q_kcore_peel at sf10/4g
    //     OOMs under the default sizing, spills green under this one.
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      (cpus.toInt * 8).toString)
    val maxPart = sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "33554432")
    // AQE coalesces post-shuffle partitions by COMPRESSED shuffle bytes;
    // two sorted-long columns lz4 to ~2 bytes/row, so the default 64 MB
    // advisory size re-merges the 64 partitions above into tasks of >30M
    // decoded rows — the same humongous pointer array, now built by the
    // coalesced reader (measured: q_pagerank_suppliers OOMed exactly
    // there). 16 MB advisory keeps the decoded working set heap-sized;
    // on a real small-executor cluster this is the standard knob.
    val advisory = sys.env.getOrElse("SPARK_GRAFT_ADVISORY_BYTES", "16777216")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      }
    })

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    System.err.println(s"[spill] heap=${heapMb}MB threads=$cpus sf=$sfDir")

    // JIT/scan warmup, untimed (same rationale as Bench)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()

    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    def mb(b: Long): Long = b / (1024 * 1024)
    val rows = names.flatMap(byName.get).map { q =>
      memSpill.set(0); diskSpill.set(0); peakExec.set(0)
      val t0 = System.nanoTime()
      val status =
        try { q.build(spark, sfDir).count(); "ok" }
        catch {
          case e: OutOfMemoryError => s"OOM: ${e.getMessage}"
          case e: Throwable =>
            val root = Option(e.getCause).getOrElse(e)
            if (root.isInstanceOf[OutOfMemoryError]) s"OOM: ${root.getMessage}"
            else s"error: ${root.getClass.getSimpleName}"
        }
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      // listener events are posted asynchronously; drain before reading
      try org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 30000)
      catch { case _: Throwable => () }
      val line = (q.name, status, sec, mb(memSpill.get), mb(diskSpill.get),
        mb(peakExec.get))
      System.err.println(s"[spill] ${q.name} $status ${sec}s " +
        s"mem_spill=${line._4}MB disk_spill=${line._5}MB " +
        s"peak_exec=${line._6}MB")
      spark.catalog.clearCache()
      line
    }

    val json = rows.map { case (n, st, sec, ms, ds, pk) =>
      s""""$n":{"status":"$st","sec":$sec,"mem_spill_mb":$ms,""" +
        s""""disk_spill_mb":$ds,"peak_exec_mb":$pk}"""
    }.mkString("{", ",", "}")
    val ooms = rows.count(_._2.startsWith("OOM"))
    spark.stop()
    println(s"""{"probe":"spill","heap_mb":$heapMb,"threads":$cpus,""" +
      s""""sf":"$sfDir","ooms":$ooms,"queries":$json}""")
  }
}

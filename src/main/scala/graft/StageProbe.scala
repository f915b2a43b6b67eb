package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profiler (dev tool): run named queries and print each
  * completed stage's wall time, task count, and I/O volumes — for
  * finding WHERE a decade-up regression lives when `explain` shows the
  * intended plan (a plan-shape diff and a runtime diff don't always
  * co-locate; round 11's q_bm25_topk was 20× up at sf10 with a plan
  * isomorphic to its warm-fast ndcg twin).
  *
  * Usage: runMain graft.StageProbe <sfDir> <query...>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, ms: Long, tasks: Int,
        inMb: Long, shReadMb: Long, shWriteMb: Long, spillMb: Long,
        gcMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(90), ms,
            i.numTasks, m.inputMetrics.bytesRead / 1048576,
            m.shuffleReadMetrics.remoteBytesRead / 1048576 +
              m.shuffleReadMetrics.localBytesRead / 1048576,
            m.shuffleWriteMetrics.bytesWritten / 1048576,
            m.memoryBytesSpilled / 1048576,
            // summed ACROSS tasks — at 32 concurrent tasks a shared GC
            // pause bills every running task, so gc ≈ 32× wall during a
            // storm; the point is attribution (gc-dominated vs not),
            // not wall accounting
            m.jvmGCTime)
        }
      }
    })

    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    // the listener bus is async: drain it once here or the warm-up's
    // stage-completed events can land AFTER the first stages.clear() and
    // be attributed to the first named query (round-11 advisor)
    try org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 30000)
    catch { case _: Throwable => () }
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      byName(n).build(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      try org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext, 30000)
      catch { case _: Throwable => () }
      println(f"==== $n $sec%.2f s ====")
      stages.synchronized {
        stages.sortBy(-_.ms).take(12).foreach { s =>
          println(f"  stage ${s.id}%4d ${s.ms}%7d ms ${s.tasks}%4d tasks " +
            f"in=${s.inMb}%5d MB shR=${s.shReadMb}%5d shW=${s.shWriteMb}%5d " +
            f"spill=${s.spillMb}%5d gc=${s.gcMs}%6d ms  ${s.name}")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

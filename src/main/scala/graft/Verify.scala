package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit, ThreadFactory, TimeoutException}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round 8 harness hardening (round-7 postmortem: ONE query with an
  * exponential-lineage plan hung the sequential sweep forever and emptied
  * the round's correctness artifact):
  *   - queries run CONCURRENTLY on a bounded daemon pool (default 8, env
  *     SPARK_GRAFT_VERIFY_THREADS) sharing one SparkSession — Spark's
  *     scheduler interleaves independent jobs fine, and the 220-query
  *     battery drops from ~15 min sequential to well under the driver
  *     budget;
  *   - each query is WALL-CLOCK BOXED (default 180 s, env
  *     SPARK_GRAFT_QUERY_TIMEOUT): on expiry its Spark job group is
  *     cancelled and the sweep moves on, so a future planning/runaway bug
  *     costs one query line, not the round's artifacts. A query hung in
  *     Catalyst ANALYSIS (no jobs to cancel) permanently occupies one pool
  *     slot — the other slots still drain the battery.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — dump only those
    // (targeted re-gating after a fix; the driver always runs all)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val nThreads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "180").toLong
    val pool = Executors.newFixedThreadPool(nThreads, new ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"verify-${n.getAndIncrement()}")
        t.setDaemon(true) // a hung slot must not block JVM exit
        t
      }
    })
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        name -> pool.submit(new Runnable {
          def run(): Unit = {
            // job group = query name, so the watchdog can cancel exactly
            // this query's jobs on timeout (setJobGroup is thread-local)
            spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
            // repartition(1), NOT coalesce(1): coalesce propagates the
            // 1-task constraint upstream through every narrow stage, so a
            // query whose heavy compute sits after its last shuffle runs
            // single-threaded (q_ngram_jaccard_blocked: 2s parallel →
            // timeout). repartition shuffles only the final small result
            // into the one output file.
            try fn(spark, sfDir).repartition(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            finally {
              spark.sparkContext.clearJobGroup()
              // builders persist intermediates they can't always unpersist
              // (they never see their last action); periodic sweeps bound
              // the leak without thrashing peers' in-flight caches
              if (done.incrementAndGet() % 32 == 0) spark.catalog.clearCache()
            }
          }
        })
      }
    tasks.foreach { case (name, fut) =>
      try fut.get(timeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          fut.cancel(true)
          System.err.println(s"[verify] $name failed: TIMEOUT after ${timeoutSec}s")
        case e: Throwable =>
          val msg = Option(e.getCause).getOrElse(e).getMessage
          System.err.println(s"[verify] $name failed: $msg")
      }
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // a permanently hung slot is a daemon thread; force a clean exit code
    System.exit(0)
  }
}

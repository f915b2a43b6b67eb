package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology (round 2, rebalanced round 8): queries run in sorted name
  * order after a global untimed warmup, and the SQL cache is cleared
  * between queries so one query's persisted intermediates can't eat a
  * later query's execution memory. The primary sweep is a SINGLE timed
  * run per query (at 220 queries, best-of-2 no longer fits the driver's
  * sbt wall budget); the sf1 scaling sweep keeps best-of-2, where noise
  * genuinely distorts conclusions (round 1/3 showed 4-5× transient
  * outliers that don't reproduce). Every run is wall-clock boxed — see
  * timeOnce below.
  *
  * Round 3: if a second, larger scale factor is present
  * (SPARK_GRAFT_SF1_DIR, default `/root/repo/testdata/sf1` — a
  * deterministic 10× key-shifted scale-up of sf0.1, see graft.GenScale),
  * every bench query is ALSO timed once there under a wall-clock budget
  * (SPARK_GRAFT_SF1_BUDGET seconds, default 300); queries not reached are
  * listed in `sf1.skipped` — no silent caps. This is the 10×-scaling
  * evidence the 100 TB design claims rest on.
  *
  * Round 4 output contract: the driver captures only the LAST 2000 chars
  * of stdout, and rounds 1-3 proved a full per-query map (~4.5 KB) gets
  * its head truncated there — `parsed` stayed null every round. The
  * stdout line is therefore SIZE-BUDGETED: totals + failures always, then
  * per-query entries added slowest-first until the budget is reached,
  * with the omitted remainder summarized ({"omitted":n,"omitted_sec":s})
  * so the totals still reconcile. The COMPLETE maps (every query, both
  * scale factors) go to SPARK_GRAFT_BENCH_OUT (default
  * `bench_results.json`, committed with each freeze).
  */
object Bench {

  /** JSON string escaping for env-provided values (paths may contain
    * quotes/backslashes; control chars are dropped). */
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c if c < ' ' => ""
    case c => c.toString
  }

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  private def qmap(m: Seq[(String, Double)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private def arr(xs: Seq[String]): String =
    xs.map("\"" + _ + "\"").mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise scan + shuffle + codegen paths once, untimed.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // entry() only touches the relational path; round 3's first text query
    // (alphabetically q_minhash_banded_r2) paid ~5 s of JIT for the split/
    // transform/sha2/HOF/window machinery. JIT warmth is per CODE PATH,
    // not per data size — touch each expression family on a few hundred
    // rows, untimed.
    try {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .limit(256).select(col("doc_id"), col("text"), col("lang"))
      val sh = docs.withColumn("toks", split(col("text"), " "))
        .withColumn("shingles", expr(
          """CASE WHEN size(toks) >= 2
                  THEN array_distinct(transform(sequence(0, size(toks) - 2),
                                      i -> concat_ws(' ', slice(toks, i + 1, 2))))
                  ELSE array() END"""))
        .select(col("doc_id"), col("lang"), posexplode(col("shingles")).as(Seq("i", "s")))
        .withColumn("h", sha2(col("s"), 256))
      val rn = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("h"))
      sh.groupBy("doc_id").agg(min("h").as("h"), collect_set("s").as("ss"))
        .withColumn("ov", expr("size(array_intersect(ss, ss))"))
        .join(sh.select("doc_id", "lang").distinct(), "doc_id")
        .withColumn("rn", row_number().over(rn)).filter(col("rn") <= 3)
        .count()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(128)
        .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      emb.as("a").crossJoin(broadcast(emb.limit(4).as("b")))
        .withColumn("dot", graft.functions.VectorFunctions.vecDot(
          col("a.vecd"), col("b.vecd")))
        .agg(sum("dot")).collect()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()

    // A query that THROWS must never look like a fast success — it would
    // silently corrupt the scaling evidence (a time-to-crash is not a
    // runtime). Failures are reported in their own `failed` list.
    //
    // Round 8: every run is additionally WALL-CLOCK BOXED (default 150 s,
    // env SPARK_GRAFT_BENCH_TIMEOUT) on a cached daemon pool — round 7's
    // one exponential-planning query killed the entire sweep at rc=124;
    // a runaway must cost one `failed` entry, not the round's bench
    // artifact. Timing stays on the worker thread (the future measures
    // build+count exactly as before); a thread hung in Catalyst analysis
    // is abandoned (daemon) and the pool spins up a replacement.
    val benchTimeout =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TIMEOUT", "150").toLong
    val benchPool = java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"bench-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    def timeOnce(q: graft.queries.QueryDef, dir: String): Option[Double] = {
      val fut = benchPool.submit(new java.util.concurrent.Callable[Option[Double]] {
        def call(): Option[Double] = {
          spark.sparkContext.setJobGroup(q.name, q.name, interruptOnCancel = true)
          val t0 = System.nanoTime()
          val ok = try { q.build(spark, dir).count(); true }
            catch { case _: Throwable => false }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.clearJobGroup()
          if (ok) Some(sec) else None
        }
      })
      val res = try fut.get(benchTimeout, java.util.concurrent.TimeUnit.SECONDS)
        catch { case _: Throwable =>
          spark.sparkContext.cancelJobGroup(q.name)
          fut.cancel(true)
          None
        }
      spark.catalog.clearCache()
      res
    }
    // sf0.1 pass: SINGLE timed run (round-8 rebalance — best-of-2 at 220
    // queries no longer fits the driver's sbt wall budget; the global
    // warmup above already paid the per-code-path JIT, and best-of-2 is
    // retained where noise actually distorts conclusions: the sf1
    // scaling sweep).
    val benched = graft.queries.Registry.all.filter(_.bench).sortBy(_.name)
    val timed = benched.map { q => q.name -> timeOnce(q, sfDir).map(r3) }
    val results = timed.collect { case (n, Some(t)) => n -> t }
    val failed = timed.collect { case (n, None) => n }
    val total = r3(results.map(_._2).sum)

    // Secondary scale factor: best-of-2 sweep under a wall-clock budget
    // (single-run numbers proved noisy in the round-3 freeze: one GC-heavy
    // neighbor inflated q_passage_dedup 0.5 s → 11.2 s, which reads as
    // super-linear scaling when it is pure measurement noise).
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/testdata/sf1")
    val sf1Budget = sys.env.getOrElse("SPARK_GRAFT_SF1_BUDGET", "300").toDouble
    val sf1 = if (!new java.io.File(sf1Dir, "lineitem.parquet").exists()) None
      else {
        var spent = 0.0
        val done = scala.collection.mutable.ListBuffer.empty[(String, Double)]
        val skipped = scala.collection.mutable.ListBuffer.empty[String]
        val sfailed = scala.collection.mutable.ListBuffer.empty[String]
        benched.foreach { q =>
          if (spent < sf1Budget) {
            val t0 = System.nanoTime()
            ((timeOnce(q, sf1Dir), timeOnce(q, sf1Dir)) match {
              case (Some(a), Some(b)) => Some(math.min(a, b))
              case _ => None
            }) match {
              case Some(s) =>
                spent += (System.nanoTime() - t0) / 1e9 // both runs cost budget
                done += (q.name -> r3(s))
              case None =>
                spent += (System.nanoTime() - t0) / 1e9 // crashes cost budget too
                sfailed += q.name
            }
          } else skipped += q.name
        }
        Some((done.toList, skipped.toList, sfailed.toList))
      }

    // FULL artifact → file: every query at both scale factors.
    val fullSf1 = sf1.map { case (done, skipped, sfailed) =>
      s""","sf1":{"dir":"${esc(sf1Dir)}","total":${r3(done.map(_._2).sum)},""" +
        s""""queries":${qmap(done)},"skipped":${arr(skipped)},"failed":${arr(sfailed)}}"""
    }.getOrElse("")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"${esc(sfDir)}",""" +
        s""""queries":${qmap(results)},"failed":${arr(failed)}$fullSf1}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    try {
      val w = new java.io.PrintWriter(outPath)
      try w.println(fullLine) finally w.close()
    } catch { case _: Throwable => () }

    // COMPACT stdout line, budgeted to survive the 2000-char tail capture
    // (leave ~250 chars of headroom for sbt's "[success] ..." trailer and
    // anything else the build tool appends after us).
    val budget = sys.env.getOrElse("SPARK_GRAFT_LINE_BUDGET", "1750").toInt
    val bySlow = results.sortBy(-_._2)
    val sf1Compact = sf1.map { case (done, skipped, sfailed) =>
      val sf1Total = r3(done.map(_._2).sum)
      val ratios = done.flatMap { case (n, t) =>
        results.find(_._1 == n).collect { case (_, b) if b > 0 => (n, r3(t / b)) }
      }
      val maxRatio = if (ratios.isEmpty) "" else {
        val (n, r) = ratios.maxBy(_._2)
        s""","max_ratio":{"q":"$n","x":$r}"""
      }
      val slow = done.sortBy(-_._2).take(6)
      s""","sf1":{"total":$sf1Total,"n":${done.size},"slowest":${qmap(slow)}""" +
        s"""$maxRatio,"skipped":${skipped.size},"failed":${arr(sfailed)}}"""
    }.getOrElse("")
    def line(k: Int): String = {
      val kept = bySlow.take(k)
      val omitted = bySlow.drop(k)
      val om = if (omitted.isEmpty) ""
        else s""","omitted":${omitted.size},"omitted_sec":${r3(omitted.map(_._2).sum)}"""
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"${esc(sfDir)}",""" +
        s""""n":${results.size},"queries":${qmap(kept.sortBy(_._1))}$om""" +
        s""","failed":${arr(failed)}$sf1Compact,"detail":"${esc(outPath)}"}"""
    }
    // largest k whose line fits the budget (k=0 always emits the totals)
    val k = (results.size to 0 by -1).find(line(_).length <= budget).getOrElse(0)
    val compact = line(k)

    spark.stop()
    // last line of stdout — the driver parses this
    println(compact)
    Console.out.flush()
    // abandoned timeout threads are daemons, but make exit unconditional
    System.exit(0)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Throwaway r16 A/B probe: time named queries with their builder pins
  * active vs disabled (Cached.posturePlan — persists stay, PlanPin off),
  * interleaved in ONE JVM so host drift hits both arms equally. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    for (r <- 1 to reps; n <- names;
        // arms ALTERNATE first position per rep: the first cut of this
        // probe ran the pin arm first every rep, and three pinless
        // control queries read 15-30% "pin losses" — pure ordering
        // artifact (the first arm inherits the previous query's GC debt)
        mode <- if (r % 2 == 1) Seq("pin", "nopin") else Seq("nopin", "pin")) {
      spark.catalog.clearCache()
      val q = byName(n)
      val t0 = System.nanoTime()
      if (mode == "nopin")
        graft.queries.Cached.posturePlan(q.build(spark, sfDir).count())
      else q.build(spark, sfDir).count()
      println(f"[ab] $n%-28s $mode%-6s rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

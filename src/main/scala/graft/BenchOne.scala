package graft

import org.apache.spark.sql.SparkSession

/** Time a named subset of registered queries on a given SF dir (dev tool:
  * `runMain graft.BenchOne <sfDir> <query...>`). Same methodology as Bench
  * (untimed warmup, cache cleared between runs). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1) // in order; repeats allowed (warm-run timing)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.flatMap(byName.get).foreach { q =>
      val t0 = System.nanoTime()
      q.build(spark, sfDir).count()
      println(f"[benchone] ${q.name} ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

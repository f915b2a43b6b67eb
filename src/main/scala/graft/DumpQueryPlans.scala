package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `explain("formatted")` for the named queries into
  * per-query files — the before/after plan evidence committed under
  * `plans/r<N>/` each optimization round.
  *
  * Usage: runMain graft.DumpQueryPlans <sfDir> <outDir> <suffix> [query ...]
  *   (no query names → nothing; names are explicit so a round's evidence
  *   set is deliberate). Files land at `<outDir>/<query>_<suffix>.txt`.
  *
  * Two modes per query, controlled by a `raw:` prefix on the name:
  *   - default: audit-transparent plan (Cached.auditPlan — full composed
  *     lineage, nothing persisted or executed), the view plan-size claims
  *     are measured against;
  *   - `raw:q_name`: the plan exactly as the timed runner executes it
  *     (pins visible as `Scan ExistingRDD`; building it materializes the
  *     pinned frames, as the timed path does).
  */
object DumpQueryPlans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args.toSeq.toArray
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    rest.foreach { spec =>
      val raw = spec.startsWith("raw:")
      val name = if (raw) spec.stripPrefix("raw:") else spec
      def fmt = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val plan = if (raw) fmt else graft.queries.Cached.auditPlan(fmt)
      val f = s"$outDir/${name}_$suffix.txt"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f), plan)
      System.err.println(s"[plans] wrote $f (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

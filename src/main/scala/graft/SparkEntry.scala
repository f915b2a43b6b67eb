package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the module registry
  * (graft.queries.*): one entry per implemented operator from SURVEY.md §2,
  * each paired with DuckDB-runnable oracle SQL where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the COMPLETE end-to-end scoring lifecycle (SURVEY.md §3.1 —
    * composite + talent-risk adjustment + prior blend + SEM confidence
    * interval) as one declarative plan over the events "signals" table.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.scoring.ScorePipeline.fullScores(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query.
  *
  * Contract (driver-side, see builder prompt):
  *   - `build(spark, sfDir)` returns the Spark result;
  *   - `oracle` is ANSI SQL executed by DuckDB over the same parquet tables
  *     (bare table names: lineitem, orders, …, documents, embeddings);
  *   - the driver sorts columns BY NAME and hashes values, so Spark and
  *     oracle column names must match exactly.
  *
  * Determinism rules applied throughout the modules:
  *   - every floating-point output is `round(x, k)` in BOTH engines (double
  *     sums differ in the last ulp across engines/partitionings);
  *   - every result carries a total ORDER BY with a unique tie-break;
  *   - timestamps are emitted as epoch-µs longs or formatted strings, never
  *     raw timestamp columns (tz-awareness differs between the two readers).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

trait QueryModule {
  def queries: Seq[QueryDef]
}

/** All query modules, flattened; names asserted unique. */
object Registry {
  def modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    ScoringQueries,
    TextQueries,
    DedupQueries,
    EmbeddingQueries,
    MultimodalQueries)

  lazy val all: Seq[QueryDef] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-upsert and dedup-gate primitives (reference sinks S9/S12,
  * SURVEY.md §2.1: MERGE upserts in dimension_pipeline.py:38-74 /
  * run_scoring_engine.py:191-258, content-hash gates in
  * signal_store.py:21-28 / evidence_store.py:61-68).
  *
  * Scale notes: `lastWins` is one shuffle on the merge keys (window) —
  * at 100 TB partition the base table by the key prefix on write so the
  * union co-partitions. `dedupGate` is a left_anti equi-join: broadcast
  * when the seen-hash set is small, shuffle-hash otherwise (AQE picks).
  */
object Upsert {

  /** MERGE semantics as a batch op: rows from `incoming` replace rows in
    * `base` sharing the same `keys`; ties broken by `orderCols` descending
    * (latest wins), with `incoming` preferred on exact ties. */
  def lastWins(base: DataFrame, incoming: DataFrame, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc) :+ col("_src").desc: _*)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Content-hash ingest gate: drop incoming rows whose `hashCol` already
    * exists in `seen` (idempotent re-ingest, S12). */
  def dedupGate(incoming: DataFrame, seen: DataFrame, hashCol: String): DataFrame =
    incoming.join(seen.select(hashCol).distinct(), Seq(hashCol), "left_anti")

  /** Existence is a filesystem fact, not an exception pattern: callers
    * gating dedup on "does the store exist yet" must use this, never a
    * catch-all around the read — a transient read failure on an EXISTING
    * store would silently disable dedup (see StreamIngest). */
  def pathExists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** In-batch first-wins dedup on a hash with a deterministic tie order. */
  def dedupInBatch(df: DataFrame, hashCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(hashCol)).orderBy(orderCols: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}

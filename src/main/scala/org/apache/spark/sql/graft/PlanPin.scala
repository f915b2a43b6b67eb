// Lives under org.apache.spark.sql because LogicalRDD and the classic
// Dataset.ofRows bridge are private[sql] extension surface — same
// rationale as AsOfJoinNative / KmvSketchAgg.
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation WITHOUT new block materialization (round 15).
  *
  * A composed lazy DAG that re-references shared intermediates duplicates
  * each intermediate's logical subtree per reference, and the duplication
  * COMPOUNDS through the composition: q_curation_e2e's final census plan
  * reached 3,905 Exchange nodes / 5.8 MB of formatted text while executing
  * almost nothing (the shared subtrees are persisted by
  * `graft.queries.Cached.withCached`). Catalyst walks — analysis,
  * optimizer batches, and the CacheManager's canonicalize-and-match on
  * every consumer — are tree walks, so the DRIVER pays the duplicated
  * size on every round trip; at sf0.1 plan work was ~2/3 of that query's
  * wall time (plan-only explain ≈ 20 s), and in the one-JVM bench sweep
  * the churned Catalyst trees billed a 107 s GC storm to 32 idle tasks.
  *
  * `truncated` rebuilds a DataFrame on a ONE-NODE logical plan — r16:
  * the cached InMemoryRelation leaf itself (see the method doc; the r15
  * shape was a LogicalRDD over the frame's executed RDD, whose
  * per-consumer-read costs two A/B rounds measured and killed). Nothing
  * executes at wrap time; no deserialized row blocks enter the block
  * manager (the round-10 sweep-hygiene lesson — `clearCache()` cannot
  * free checkpoint blocks). Consumers' plans become leaf-sized and read
  * the SQL cache while the caller's persist is live.
  */
object PlanPin {

  /** Same rows as `df`, one-node logical plan. Call AFTER `df` is
    * persisted and materialized (the wrap itself plans `df` once — the
    * last full-tree walk — and never again).
    *
    * r16: the pin is the cached InMemoryRelation LEAF itself (the
    * CacheManager's own representation of the persisted frame), not a
    * LogicalRDD over `toRdd`. Both are one-node logical plans, but the
    * LogicalRDD was opaque at READ time too: every consumer read ran the
    * wrapped RDD behind an `RDDScanExec` — an un-fusable iterator
    * boundary plus an extra per-row UnsafeProjection, with the cache's
    * column pruning and batch-level filter pushdown lost. A 62-site
    * interleaved same-JVM A/B (AbProbe, r16) measured that as a
    * consistent 5-65% per-query cost on mid-tier queries. The IMR leaf
    * plans to the same InMemoryTableScan a withCached consumer gets —
    * pruned, filter-pushed, fused into the consumer's WholeStageCodegen
    * — while consumer logical plans stay leaf-sized (the r15 win: no
    * re-analysis/re-canonicalization of the duplicated upstream subtree
    * per reference).
    *
    * Lifetime: while the caller's persist is live, reads hit the built
    * buffers; after unpersist, InMemoryTableScan re-materializes from
    * the relation's embedded physical plan (Spark's standard
    * lost-block recompute path — PlanPinSpec pins survive-unpersist).
    * Fallback for an uncached frame: the r15 LogicalRDD wrapper (no
    * per-row copy — RDDScanExec re-projects every row into its own
    * buffer anyway, verified against the 4.1.2 bytecode). */
  def truncated(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds) match {
      case Some(cd) => Dataset.ofRows(ds.sparkSession, cd.cachedRepresentation)
      case None =>
        Dataset.ofRows(ds.sparkSession,
          LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
    }
  }
}

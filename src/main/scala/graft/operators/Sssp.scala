package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single-source(-set) shortest paths — synchronous Bellman-Ford
  * rounds, the weighted sibling of [[BfsLevels]] and the fifth member of
  * the iterative-graph family (rank flow, label flooding, frontier
  * expansion, monotone deletion, now weighted relaxation). Same scale
  * discipline:
  *
  *   - one shuffle per round (the min-dist aggregate keyed by node); the
  *     edge frame is materialized once and reused;
  *   - distances are exact integer weight sums — bit-deterministic under
  *     any partitioning, replayable by the oracle's unrolled CTEs;
  *   - lineage truncates on a cadence, not per round.
  *
  * After round i every node carries the cheapest path using ≤ i edges —
  * the classic Bellman-Ford invariant — so `rounds` bounds path length,
  * not an approximation knob. Negative weights are rejected: with the
  * bounded-rounds contract they'd still be well-defined, but every caller
  * here wants a metric, and a negative edge is a data bug.
  */
object Sssp {

  /** (node, dist) for every node reachable from `seeds` within `rounds`
    * edges. `edges(src, dst, w)` is directed with non-negative long
    * weights; symmetrize before calling for undirected semantics.
    *
    * The edge frame is materialized ONCE into the compressed COLUMNAR
    * cache (`persist`), not `localCheckpoint`: the round-9 sf10 probes
    * measured all three edge-handling strategies on the 117M-row
    * purchase multigraph (q_sssp_delay end to end) —
    *   - `localCheckpoint` (deserialized row blocks): 364 s, ~200 s of it
    *     block-manager materialization + GC;
    *   - no materialization (re-derive per round, broadcast frontier):
    *     1067 s — the union-of-rounds lineage doubles per round and
    *     exchange reuse does NOT reliably collapse the re-derivations;
    *   - columnar persist: the cache builds inside round 1's job at
    *     parquet-scan speed (~10× smaller than row blocks) and every
    *     later round re-reads it shuffle-free.
    * `materializeEdges = false` skips the cache for single-round calls or
    * callers that manage their own edge materialization. */
  def distances(edges: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 1, materializeEdges: Boolean = true): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .filter(col("w") >= 0L)
    val e = if (materializeEdges)
      e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else e0
    var dist = seeds.select(col("node").cast("long"))
      .distinct().withColumn("dist", lit(0L))
    for (i <- 1 to rounds) {
      // The frontier side is BROADCAST by contract: a seeded traversal's
      // frontier is bounded by the seeds' component, never the corpus.
      // Without the hint, AQE sometimes plans the round as a sort-merge
      // join — shuffling the FULL edge frame by src every round (measured
      // 592 s vs 84 s at sf10 for the same query, run to run). With it,
      // the only exchange in the unmaterialized path is the one inside
      // the edge derivation, which ReuseExchange collapses across rounds.
      val frontier = broadcast(dist.withColumnRenamed("node", "src"))
      val relaxed = e.join(frontier, "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
      // Cadence default is EVERY round, not every 3 (second round-9 sf10
      // lesson): this loop references dist_prev TWICE — the union branch
      // and the broadcast build — and a BroadcastExchange is never reused
      // against a shuffle exchange of the same subplan, so an untruncated
      // lineage re-executes ~2^rounds times (measured 343 s with cadence
      // 3 vs the per-round-truncated time at sf10; the dist frame is
      // ≤ |nodes| rows of 16 bytes — truncating it is noise). PageRank
      // keeps cadence 3: its loop references the prior state ONCE, so
      // its lineage grows linearly and eager truncation there only adds
      // jobs (the round-4 lesson).
      if (i % checkpointEvery == 0 && i < rounds) dist = dist.localCheckpoint()
    }
    dist
  }
}

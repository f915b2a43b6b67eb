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
    // round 13: per-round reduce parallelism scales with the graph
    // (IterScale; see BfsLevels — same rationale, same eager-inside-scope
    // guarantee from the final localCheckpoint)
    def run(): DataFrame = relaxLoop(e, seeds, rounds, checkpointEvery,
      materializeEdges)
    if (materializeEdges)
      IterScale.withEdgeScaledShuffle(e.sparkSession, e.count())(run())
    else run()
  }

  private def relaxLoop(e: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int, materializeEdges: Boolean): DataFrame = {
    var dist = seeds.select(col("node").cast("long"))
      .distinct().withColumn("dist", lit(0L))
    // DELTA relaxation (round 10, the classic Bellman-Ford frontier
    // optimization): only nodes whose distance CHANGED last round can
    // offer a new distance this round — a node u with dist_i(u) =
    // dist_{i-1}(u) already made the offer dist(u)+w to every neighbor
    // in round i, so re-offering in round i+1 is a no-op. The fixed
    // point after k rounds is bit-identical to full re-relaxation (the
    // oracle replays the FULL form and the hash gate proves equality),
    // but the broadcast side is now the true frontier — which SHRINKS
    // after the expansion waves pass — instead of the accumulated
    // visited set, which approaches |V| on a connected graph and would
    // eventually hit Spark's 8 GB broadcast cliff at the design scale
    // (the round-9 advisor finding). The frontier hint stays BROADCAST
    // by contract: a seeded traversal's frontier is bounded by the wave,
    // never the corpus; without the hint AQE sometimes plans the round
    // as a sort-merge join, shuffling the FULL edge frame by src every
    // round (measured 592 s vs 84 s at sf10, run to run).
    var frontier = dist
    for (i <- 1 to rounds) {
      val fr = broadcast(frontier.withColumnRenamed("node", "src"))
      val offers = e.join(fr, "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy("node").agg(min("nd").as("nd"))
      // one full-outer merge yields BOTH the new state and the delta:
      // improved = first visit (od null) or a strictly better offer
      val merged = dist.withColumnRenamed("dist", "od")
        .join(offers, Seq("node"), "full_outer")
        .select(col("node"), least(col("od"), col("nd")).as("dist"),
          (col("od").isNull || (col("nd").isNotNull && col("nd") < col("od")))
            .as("chg"))
      // Cadence default is EVERY round, not every 3 (round-9 sf10
      // lesson): the loop references merged_prev TWICE — the dist merge
      // branch and the frontier broadcast build — and a
      // BroadcastExchange is never reused against a shuffle exchange of
      // the same subplan, so an untruncated lineage re-executes
      // ~2^rounds times (measured 343 s with cadence 3 vs the per-round-
      // truncated time at sf10; merged is ≤ |visited| rows of ~17 bytes
      // — truncating it is noise). PageRank keeps cadence 3: its loop
      // references the prior state ONCE, so its lineage grows linearly.
      val m = if (i % checkpointEvery == 0 && i < rounds) merged.localCheckpoint()
        else merged
      dist = m.select("node", "dist")
      frontier = m.filter(col("chg")).select("node", "dist")
    }
    if (materializeEdges) {
      // hygiene for long-lived sessions (round-9 advisor): pin the small
      // result, then release the edge cache — the harness's clearCache
      // frees the pin; repeated library calls no longer accumulate
      // executor storage
      val out = dist.localCheckpoint()
      e.unpersist()
      out
    } else dist
  }
}

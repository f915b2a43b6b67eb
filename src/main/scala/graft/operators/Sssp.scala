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
    * weights; symmetrize before calling for undirected semantics. */
  def distances(edges: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .filter(col("w") >= 0L)
      .localCheckpoint()
    var dist = seeds.select(col("node").cast("long"))
      .distinct().withColumn("dist", lit(0L))
    for (i <- 1 to rounds) {
      val relaxed = e.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
      if (i % checkpointEvery == 0 && i < rounds) dist = dist.localCheckpoint()
    }
    dist
  }
}

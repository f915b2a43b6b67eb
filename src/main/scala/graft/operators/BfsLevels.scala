package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS levels (frontier expansion) — min-hop distance from a
  * seed set over directed edges, the third member of the iterative-graph
  * family next to [[PageRank]] and [[ConnectedComponents]], and the same
  * scale discipline:
  *
  *   - each round is ONE shuffle (the min-dist aggregate keyed by node);
  *     the edge side is materialized once and reused every round;
  *   - distances are exact integers — no float state, bit-deterministic
  *     under any partitioning, replayable by the oracle's unrolled CTEs;
  *   - lineage truncates on a cadence, not per round (the PageRank
  *     r4 lesson: eager per-round materialization tripled the runtime).
  *
  * This is level-synchronous BFS (Pregel-style): after round i every node
  * within i hops carries its final distance — rounds beyond the graph
  * diameter are no-ops. Unreached nodes are absent from the result.
  */
object BfsLevels {

  /** (node, dist) for every node within `maxHops` of `seeds`.
    * `edges(src, dst)` is directed; symmetrize before calling for
    * undirected semantics. */
  def levels(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      checkpointEvery: Int = 3): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    var dist = seeds.select(col("node").cast("long"))
      .distinct().withColumn("dist", lit(0))
    for (i <- 1 to maxHops) {
      val next = e.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + lit(1)).as("dist"))
      dist = dist.unionByName(next)
        .groupBy("node").agg(min("dist").as("dist"))
      if (i % checkpointEvery == 0 && i < maxHops) dist = dist.localCheckpoint()
    }
    dist
  }
}

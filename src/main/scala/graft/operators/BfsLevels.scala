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
    * undirected semantics. The edge frame is materialized once into the
    * compressed COLUMNAR cache — not `localCheckpoint`, whose
    * deserialized row blocks cost ~200 s of heap+GC on a 117M-row frame,
    * and not re-derived per round, which the round-9 sf10 probes showed
    * is hostage to exchange reuse across a lineage that doubles per
    * round (see [[Sssp.distances]] for the measured three-way
    * comparison). `materializeEdges = false` opts out for single-round
    * calls or callers that manage their own materialization. */
  def levels(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      checkpointEvery: Int = 1, materializeEdges: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e = if (materializeEdges)
      e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else e0
    // round 13: scale the per-round aggregate's reduce parallelism with
    // the graph (IterScale — the iterative family's fixed-partition rounds
    // were the one superlinear decade ratio); the whole fixed point
    // executes eagerly inside the scope (the final localCheckpoint), so
    // the session conf is restored before return. Unmaterialized callers
    // keep the session parallelism — the count would re-scan their lineage.
    def run(): DataFrame = levelLoop(e, seeds, maxHops, checkpointEvery,
      materializeEdges)
    if (materializeEdges)
      IterScale.withEdgeScaledShuffle(e.sparkSession, e.count())(run())
    else run()
  }

  private def levelLoop(e: DataFrame, seeds: DataFrame, maxHops: Int,
      checkpointEvery: Int, materializeEdges: Boolean): DataFrame = {
    var dist = seeds.select(col("node").cast("long"))
      .distinct().withColumn("dist", lit(0))
    // DELTA expansion (round 10 — see Sssp.distances for the full
    // rationale and the equality proof): only nodes discovered LAST
    // round can discover new nodes this round, so the broadcast side is
    // the true frontier wave — which saturates and shrinks — instead of
    // the accumulated visited set, which approaches |V| on a connected
    // graph and would eventually hit the 8 GB broadcast cliff at the
    // design scale (the round-9 advisor finding). In level-synchronous
    // BFS a visited node's level is FINAL (every later offer is larger),
    // so the delta is exactly the first-visit set and the census after k
    // rounds is bit-identical to full re-expansion — the oracle replays
    // the full form and the hash gate proves it.
    var frontier = dist
    for (i <- 1 to maxHops) {
      // frontier broadcast by contract — see Sssp.distances: without the
      // hint AQE sometimes re-shuffles the full edge frame every round
      val fr = broadcast(frontier.withColumnRenamed("node", "src"))
      val offers = e.join(fr, "src")
        .select(col("dst").as("node"), (col("dist") + lit(1)).as("nd"))
        .groupBy("node").agg(min("nd").as("nd"))
      val merged = dist.withColumnRenamed("dist", "od")
        .join(offers, Seq("node"), "full_outer")
        .select(col("node"), least(col("od"), col("nd")).as("dist"),
          col("od").isNull.as("chg")) // unit weights: improvement ⇔ first visit
      // cadence default 1: merged_prev is referenced twice per round
      // (merge + broadcast build) and broadcast exchanges never reuse
      // shuffle exchanges, so an untruncated lineage re-executes
      // ~2^rounds times — see Sssp.distances for the sf10 measurements;
      // merged is ≤ |visited| small rows, so per-round truncation is noise
      val m = if (i % checkpointEvery == 0 && i < maxHops) merged.localCheckpoint()
        else merged
      dist = m.select("node", "dist")
      frontier = m.filter(col("chg")).select("node", "dist")
    }
    if (materializeEdges) {
      // hygiene for long-lived sessions (round-9 advisor): pin the small
      // result, release the edge cache
      val out = dist.localCheckpoint()
      e.unpersist()
      out
    } else dist
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the cluster
  * step of a dedup pipeline (near-dup PAIRS → duplicate GROUPS → one
  * canonical doc per group).
  *
  * Each round every vertex takes the min of its own component label and its
  * neighbors' labels; fixpoint is reached in O(graph diameter) rounds.
  * Near-dup graphs are overwhelmingly tiny cliques/chains, so 3-4 rounds
  * typically converge; `maxIter` caps the shuffle count regardless. Each
  * round is one join + one map-side-combined min aggregation — no
  * collect, no driver-side graph. (GraphFrames' large-star/small-star CC
  * is the same fixpoint with fancier reshaping; plain propagation keeps
  * the dependency-free implementation honest.)
  */
object ConnectedComponents {

  /** @param vertices one `id` column (must be unique)
    * @param edges    `src`/`dst` columns, treated as undirected
    * @return (id, comp) — comp = min vertex id of the component
    *
    * Each round ends in an eager `localCheckpoint`: the round's plan
    * references the previous frame twice, so WITHOUT lineage truncation
    * the logical plan doubles per round (2^rounds — a driver OOM long
    * before any data moves). On a cluster with a checkpoint dir,
    * `checkpoint()` gives the fault-tolerant variant. */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val (comp, converged) = runWithStatus(vertices, edges, maxIter)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ConnectedComponents: iteration cap $maxIter hit before fixpoint — " +
          "labels may span unmerged components; raise maxIter")
    comp
  }

  /** Like `run`, but also reports whether the fixpoint was actually reached
    * (false = the `maxIter` cap fired first and labels may be unmerged). */
  def runWithStatus(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20): (DataFrame, Boolean) = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    // the count fills the symmetrized cache (the old isEmpty probe read
    // one partition and left the fill to round 1) and sizes the rounds'
    // reduce parallelism (IterScale, round 13 — the iterative family's
    // fixed-partition rounds were the one superlinear decade ratio);
    // every round executes eagerly inside the scope (localCheckpoint +
    // the convergence probe), so the conf wrap is sound
    val nEdges = sym.count()
    var comp = vertices.select(col("id"), col("id").as("comp")).localCheckpoint()
    var iter = 0
    var done = nEdges == 0L
    IterScale.withEdgeScaledShuffle(sym.sparkSession, nEdges) {
      while (!done && iter < maxIter) {
        val nbrMin = sym.join(comp, sym("src") === comp("id"))
          .select(col("dst").as("nid"), col("comp").as("ncomp"))
          .groupBy("nid").agg(min("ncomp").as("nbr_min"))
        val next = comp.join(nbrMin, comp("id") === nbrMin("nid"), "left")
          .select(comp("id"),
            least(comp("comp"), coalesce(col("nbr_min"), comp("comp"))).as("comp"))
          .localCheckpoint() // eager: materializes AND truncates lineage
        done = next.as("n").join(comp.as("o"), Seq("id"))
          .filter(col("n.comp") =!= col("o.comp")).isEmpty
        comp.unpersist()
        comp = next
        iter += 1
      }
    }
    sym.unpersist()
    (comp, done)
  }
}

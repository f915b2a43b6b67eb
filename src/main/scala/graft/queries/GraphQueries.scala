package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Det.{dround, oround}

/** Graph analytics over the purchase graph (customers ↔ suppliers via
  * lineitem): iterative fixed-point computations expressed as join +
  * aggregate rounds. Companions to the dedup family's connected-components
  * clustering (q_neardup_clusters) — together they cover the two iterative
  * propagation classes (unweighted label flooding, weighted rank flow). */
object GraphQueries extends QueryModule {

  private val Iters = 3

  /** Node encoding for the bipartite graph: customer c ↦ 2c (even),
    * supplier s ↦ 2s+1 (odd) — disjoint id spaces in one long column. */

  // -- PageRank over the symmetrized customer–supplier purchase graph,
  //    Iters rounds on the 1e-9 integer grid (graft.operators.PageRank:
  //    bit-deterministic under any partitioning, so the DuckDB oracle
  //    replays the rounds exactly). Suppliers ranked by how much customer
  //    walk-mass reaches them — the bipartite analog of vendor importance.
  //    Scale: each round shuffles contributions on dst once; edges are
  //    DISTINCT (cust, supp) pairs, so duplicate lineitems never multiply
  //    walk mass; lineage is truncated per round.
  private val pagerankSuppliers = QueryDef(
    "q_pagerank_suppliers",
    (s, dir) => {
      val e0 = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("p"))
        .distinct()
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val ranks = graft.operators.PageRank.ranks(edges, Iters)
      ranks.filter(col("node") % 2 === 1)
        .select(((col("node") - 1) / 2).cast("long").as("s_suppkey"),
          dround(col("r") / 1e9, 6).as("rank"))
        .orderBy(col("rank").desc, col("s_suppkey").asc)
        .limit(10)
    },
    Some {
      // unroll the same integer-grid rounds as CTEs
      val rounds = (1 to Iters).map { i =>
        s"""c$i AS (SELECT e.dst AS node,
                 CAST(sum(r.r // o.outdeg) AS BIGINT) AS sc
               FROM edges e
               JOIN outd o ON e.src = o.src
               JOIN r${i - 1} r ON r.node = e.src
               GROUP BY e.dst),
        r$i AS (SELECT n.node,
                 150000000 + (coalesce(c.sc, CAST(0 AS BIGINT)) * 85) // 100
                   AS r
               FROM nodes n LEFT JOIN c$i c ON n.node = c.node)"""
      }.mkString(",\n        ")
      s"""
      WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        edges AS (SELECT c AS src, p AS dst FROM e0
                  UNION ALL SELECT p AS src, c AS dst FROM e0),
        outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        $rounds
      SELECT (node - 1) // 2 AS s_suppkey,
             ${oround(s"r / 1e9", 6)} AS rank
      FROM r$Iters WHERE node % 2 = 1
      ORDER BY rank DESC, s_suppkey ASC
      LIMIT 10"""
    })

  override def queries: Seq[QueryDef] = Seq(pagerankSuppliers)
}

package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.censusRows(spark, edges.toDF("a", "b"), k, rounds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("2-core peels a pendant chain, keeps the triangle") {
    // triangle 1-2-3 plus pendant path 3-4-5: node 5 dies round 1,
    // node 4 dies round 2 (its degree drops after 5 leaves), triangle stays
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(census(edges, k = 2, rounds = 3) ==
      Seq((1L, 4L, 4L), (2L, 3L, 3L), (3L, 3L, 3L)))
  }

  test("k above max degree empties the graph in one round") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(census(edges, k = 3, rounds = 2) ==
      Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }

  test("clique is its own core: census is flat from round 1") {
    val nodes = 1L to 5L
    val edges = for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)
    val rows = census(edges.toSeq, k = 4, rounds = 3)
    assert(rows == Seq((1L, 5L, 10L), (2L, 5L, 10L), (3L, 5L, 10L)))
  }
}

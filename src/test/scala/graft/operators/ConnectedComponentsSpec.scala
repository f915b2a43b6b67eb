package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, cliques, and singletons resolve to min-id components") {
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // chain 1-2-3 (needs >1 propagation round), clique 4-5-6, isolated 7
    val edges = Seq((2L, 3L), (1L, 2L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val comp = ConnectedComponents.run(vertices, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
  }

  test("long path converges within diameter rounds; no edges is identity") {
    val n = 12L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = ConnectedComponents.run(vertices, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet == Set(1L))
    val lone = ConnectedComponents.run(vertices, Seq.empty[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lone.forall { case (k, v) => k == v })
  }
}

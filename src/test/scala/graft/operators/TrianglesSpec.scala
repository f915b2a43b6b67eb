package graft.operators

import graft.SparkSpec

/** The two enumeration strategies must return IDENTICAL (n_wedges,
  * n_triangles) — the bench gate switches between them by edge count, so
  * a divergence would silently change q_triangle_count's oracle-checked
  * values at exactly the scale factors the oracle doesn't re-run. The
  * degree-ordered path's whole point is hub graphs, so the equality is
  * proven on skewed inputs. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def both(edges: Seq[(Long, Long)]): ((Long, Long), (Long, Long)) = {
    val e = edges.toDF("a", "b").persist()
    try {
      e.count()
      (Triangles.canonicalOnePass(e), Triangles.degreeOrdered(e))
    } finally e.unpersist()
  }

  test("known small graph: triangle + pendant") {
    // triangle 1-2-3 (canonical edges (1,2),(1,3),(2,3)) + pendant (3,4):
    // wedges a<b<c paths: (1,2)-(2,3), (1,3)-(3,4), (2,3)-(3,4) = 3;
    // triangles = 1
    val (canon, degOrd) = both(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(canon == ((3L, 1L)))
    assert(degOrd == ((3L, 1L)))
  }

  test("hub star closes nothing; clique closes everything") {
    // star: hub 1 to leaves 2..9 — zero wedges in canonical orientation
    // from leaf side? paths a<b<c need b to have an in and out edge:
    // all edges are (1, leaf) so only node-1 out-edges exist → 0 wedges
    val star = (2L to 9L).map(l => (1L, l))
    val (cs, ds) = both(star)
    assert(cs == ds)
    assert(cs._2 == 0L)
    // K5: wedges = C(5,3) ordered paths a<b<c = 10; all close
    val k5 = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val (ck, dk) = both(k5)
    assert(ck == ((10L, 10L)))
    assert(dk == ((10L, 10L)))
  }

  test("gate dispatch: threshold 0 forces the degree-ordered branch") {
    // the same API the query calls, with the gate forced low — what the
    // SPARK_GRAFT_TRI_GATE=0 oracle probe run exercises end-to-end
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b").persist()
    try {
      val n = e.count()
      assert(Triangles.wedgeTriangleCounts(e, n, threshold = 0L) == ((3L, 1L)))
      assert(Triangles.wedgeTriangleCounts(e, n, threshold = Long.MaxValue)
        == ((3L, 1L)))
    } finally e.unpersist()
  }

  test("equality on seeded skewed random graphs (hub-heavy)") {
    // deterministic LCG; hub-heavy: node h in [1,4] with prob ~1/2,
    // partner uniform in [1,400] — power-law-ish wedge concentration
    var s = 12345L
    def lcg(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 33) }
    val raw = (1 to 3000).map { _ =>
      val u = if (lcg() % 2 == 0) 1 + (lcg() % 4) else 1 + (lcg() % 400)
      val v = 1 + (lcg() % 400)
      (math.min(u, v), math.max(u, v))
    }.filter { case (a, b) => a != b }.distinct
    val (canon, degOrd) = both(raw.map { case (a, b) => (a.toLong, b.toLong) })
    assert(canon == degOrd, s"canonical $canon != degree-ordered $degOrd")
    assert(canon._2 > 0L, "skewed fixture should contain triangles")
  }
}

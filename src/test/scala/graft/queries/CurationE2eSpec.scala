package graft.queries

import graft.SparkSpec

/** Structural invariants for the composed curation DAG (q_curation_e2e);
  * cross-engine value equality is certified by the DuckDB oracle gate at
  * all three SFs. */
class CurationE2eSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val rows = Registry.all.find(_.name == "q_curation_e2e").get
    .build(spark, sf).collect()

  test("per-language funnel counts are monotone through all stages") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ingest = r.getAs[Long]("n_ingest")
      val qual = r.getAs[Long]("n_quality")
      val exact = r.getAs[Long]("n_exact")
      val near = r.getAs[Long]("n_neardup")
      val sampled = r.getAs[Long]("n_sampled")
      assert(ingest >= qual && qual >= exact && exact >= near,
        s"non-monotone funnel for ${r.getAs[String]("lang")}: " +
          s"$ingest/$qual/$exact/$near")
      assert(sampled <= near)
    }
  }

  test("the language gate zeroes zh downstream") {
    val zh = rows.filter(_.getAs[String]("lang") == "zh")
    zh.foreach { r =>
      assert(r.getAs[Long]("n_quality") == 0L &&
        r.getAs[Long]("n_sampled") == 0L && r.getAs[Long]("n_shards") == 0L)
    }
  }

  test("Hamilton quotas sum exactly to the doc budget") {
    assert(rows.map(_.getAs[Long]("quota")).sum == 1000L)
  }

  test("shard counts are consistent with sampled token mass") {
    rows.filter(_.getAs[Long]("n_sampled") > 0L).foreach { r =>
      val n = r.getAs[Long]("n_shards")
      val toks = r.getAs[Long]("tok_sampled")
      assert(n >= 1L && n <= toks / 2000L + 1L,
        s"${r.getAs[String]("lang")}: n_shards=$n tok_sampled=$toks")
    }
  }
}

package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Registry-level contract checks + t1-style smoke over sf0.001: every
  * declared query runs and returns rows, `entry` is non-empty, and the
  * oracle map only names registered queries (driver-contract invariants). */
class RegistrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("query names are unique and oracle keys ⊆ query names") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship composite DAG) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.build(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("multimodal decode stub matches the columnar frame-features variant") {
    val a = SparkEntry.queries("q_multimodal_frame_features")(spark, sfDir)
      .select("doc_id", "modality", "n_frames", "mean_frame_value")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = SparkEntry.queries("q_multimodal_decode_stub")(spark, sfDir)
      .selectExpr("doc_id", "modality", "n_frames", "feature")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }
}

package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Distinct-count sketches (beyond-parity, SURVEY.md §2.4 note): the engine
  * exposes Spark's HLL++ via approx_count_distinct; approximate answers
  * can't hash-match a DuckDB oracle, so the contract here is a relative
  * error bound against the exact count on real testdata. */
class SketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct error bounds track the configured rsd") {
    val o = Tables.orders(spark, sfDir)
    val r = o.agg(
      countDistinct("o_custkey").as("exact"),
      approx_count_distinct("o_custkey").as("approx"),
      approx_count_distinct("o_custkey", 0.01).as("approx_hi")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.10) // default rsd 0.05 → ~2σ
    assert(math.abs(r.getLong(2) - exact) / exact < 0.02) // tighter rsd → tighter bound
  }

  test("grouped HLL matches exact within tolerance per group") {
    val ev = Tables.events(spark, sfDir)
    val rows = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id").as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      assert(math.abs(r.getLong(2) - exact) / exact < 0.1,
        s"${r.getString(0)}: ${r.getLong(2)} vs $exact")
    }
  }
}

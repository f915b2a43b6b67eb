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

  test("CMS heavy hitters: estimate never undercounts, for EVERY token") {
    // The one-sided CMS error guarantee must hold for the full vocabulary,
    // not just the top-20 the oracle query reports. Rebuild the 4×512 cell
    // grid and check est >= exact for all distinct tokens at sf0.01.
    import org.apache.spark.sql.expressions.Window
    val base = // polynomial rolling hash, mod 2^32 (same as the query's)
      """(CASE WHEN length(tok) > 0
               THEN aggregate(transform(sequence(1, length(tok)),
                                i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT)),
                              CAST(0 AS BIGINT),
                              (acc, x) -> (acc * 31 + x) % 4294967296)
               ELSE CAST(0 AS BIGINT) END)"""
    val lcg = Seq((69069L, 12345L), (1664525L, 1013904223L),
      (65539L, 362437L), (2034059L, 1499101L))
    val tc = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .withColumn("b", expr(base))
    val rc = array(lcg.map { case (a, c) =>
      (col("b") * lit(a) + lit(c)) % lit(4294967296L) % lit(512L) }: _*)
    val cells = tc.select(col("n"), posexplode(rc).as(Seq("r", "c")))
      .groupBy("r", "c").agg(sum("n").as("cnt"))
    val est = tc.select(col("tok"), col("n"), posexplode(rc).as(Seq("r", "c")))
      .join(broadcast(cells), Seq("r", "c"))
      .groupBy("tok", "n").agg(min("cnt").as("est"))
    assert(est.filter(col("est") < col("n")).count() === 0,
      "CMS undercounted at least one token — hash rows must be independent")
    // and the sketch is useful: the top-20 relative overcount stays small
    val top = est.orderBy(col("n").desc, col("tok").asc).limit(20)
      .select(max((col("est") - col("n")) / col("n"))).head().getDouble(0)
    assert(top < 0.25, s"top-20 max relative overcount $top >= 25%")
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

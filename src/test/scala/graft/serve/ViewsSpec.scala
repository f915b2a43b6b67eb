package graft.serve

import graft.SparkSpec

class ViewsSpec extends SparkSpec {
  import spark.implicits._

  test("register exposes org_air_scores + leaderboard as SQL views (sf0.001)") {
    Views.register(spark, "/root/testdata/sf0.001")
    val top = spark.sql("SELECT * FROM leaderboard LIMIT 5").collect()
    assert(top.nonEmpty)
    val scores = top.map(_.getAs[Double]("final_score"))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    assert(spark.sql("SELECT count(*) FROM org_air_scores").head().getLong(0) > 0)
  }

  test("registerServingResults exposes the certified REST read as a view") {
    Views.registerServingResults(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(
      """SELECT company_id, dimension, composite_score, score_band,
                raw_score, sector_weight, weighted_score
         FROM serving_results""").collect()
    assert(rows.nonEmpty && rows.length % 3 == 0) // 3 dimensions per company
    // response ordering: composite DESC with deterministic ties
    val comps = rows.map(_.getAs[Double]("composite_score"))
    assert(comps.sameElements(comps.sortBy(-(_: Double))))
    // weighted = raw × weight, surviving the JSON round-trip
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("raw_score") * r.getAs[Double]("sector_weight")
        - r.getAs[Double]("weighted_score")) < 1e-9)
    }
  }

  test("latestPerEntity picks the newest row per entity") {
    val hist = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "only"))
      .toDF("entity_id", "run_ts", "v")
    val out = Views.latestPerEntity(hist, "entity_id", Seq("run_ts"))
      .orderBy("entity_id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "new"), (2L, "only")))
  }

  test("leaderboard: deterministic top-n") {
    val scores = Seq((1L, 50.0), (2L, 80.0), (3L, 80.0), (4L, 10.0))
      .toDF("entity_id", "score")
    val out = Views.leaderboard(scores, "score", "entity_id", 3)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L, 3L, 1L))
  }
}

package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HR (hiring-readiness) factor and score (reference:
  * app/scoring_engine/hr_baselines.py:102-191, scripts/run_scoring_engine.py:395-396).
  *
  * hr_factor semantics:
  *   neutral 1.0 if jobs_count < 3 or portfolio average = 0;
  *   else intensity = jobs_count / portfolio_avg,
  *        baseline_norm = clamp(baseline/75, 0.7, 1.3),
  *        factor = clamp(1 + 0.5·(intensity − 1)/baseline_norm, 0, 2).
  *
  * hr score: clamp(hr_base·(1 + 0.15·position_factor), 0, 100).
  *
  * The reference runs the per-company jobs-count query once per company
  * (correlated); here it is set-based — one groupBy over all entities plus a
  * broadcast of the single-row portfolio average (design-level decorrelation,
  * SURVEY.md §4).
  */
object HrBaselines {

  /** jobs: one row per job signal with entity_id. Returns one row per entity
    * with jobs_count, portfolio_avg, hr_factor. */
  def hrFactor(jobs: DataFrame, baseline: Column): DataFrame = {
    val counts = jobs.groupBy("entity_id").agg(count(lit(1)).as("jobs_count"))
    val avgDf = counts.agg(avg(col("jobs_count")).as("portfolio_avg"))
    val joined = counts.crossJoin(broadcast(avgDf))
    val baselineNorm = least(lit(1.3), greatest(lit(0.7), baseline / lit(75.0)))
    val intensity = col("jobs_count") / col("portfolio_avg")
    joined.withColumn("hr_factor",
      when(col("jobs_count") < 3 || col("portfolio_avg") === 0.0, lit(1.0))
        .otherwise(least(lit(2.0), greatest(lit(0.0),
          lit(1.0) + lit(0.5) * (intensity - lit(1.0)) / baselineNorm))))
  }

  def hrScore(hrBase: Column, positionFactor: Column): Column =
    least(lit(100.0), greatest(lit(0.0), hrBase * (lit(1.0) + lit(0.15) * positionFactor)))
}

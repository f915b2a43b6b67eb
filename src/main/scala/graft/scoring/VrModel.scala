package graft.scoring

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value-Realization model: confidence-floored weighted mean of dimension
  * scores (reference semantics: app/scoring_engine/vr_model.py:50-96 — floor
  * at vr_model.py:70-71), plus the coefficient-of-variation penalty
  * (scripts/run_scoring_engine.py:37-44 — POPULATION stddev, ddof=0).
  *
  * Input: one row per (entity_id, dimension) with `score`, `weight`,
  * `confidence`. One shuffle on entity_id; at 100 TB this is a map-side
  * partial-agg friendly groupBy (sums only), no skew concern (bounded
  * #dimensions per entity).
  */
object VrModel {

  /** VR = Σ(score·w·max(conf,floor)) / Σ(w·max(conf,floor)), clamped [0,100].
    * Zero total weight → 0.0 (reference returns 0 on empty/zero weights). */
  def score(dims: DataFrame, floor: Double = ScoringConfig.ConfidenceFloor): DataFrame = {
    val eff = col("weight") * greatest(col("confidence"), lit(floor))
    dims.groupBy("entity_id")
      .agg(sum(col("score") * eff).as("num"), sum(eff).as("den"))
      .select(col("entity_id"),
        least(lit(100.0), greatest(lit(0.0),
          when(col("den") =!= 0.0, col("num") / col("den")).otherwise(lit(0.0))))
          .as("vr_score"))
  }

  /** cv = stddev_pop(score)/|mean(score)|; factor = clamp(1 − rate·cv, 0, 1). */
  def cvPenalty(dims: DataFrame, rate: Double = ScoringConfig.CvPenaltyRate): DataFrame =
    dims.groupBy("entity_id")
      .agg(stddev_pop(col("score")).as("sd"), avg(col("score")).as("mu"))
      .select(col("entity_id"),
        when(abs(col("mu")) > 0.0, col("sd") / abs(col("mu"))).otherwise(lit(0.0)).as("cv"))
      .withColumn("cv_factor",
        least(lit(1.0), greatest(lit(0.0), lit(1.0) - lit(rate) * col("cv"))))
}

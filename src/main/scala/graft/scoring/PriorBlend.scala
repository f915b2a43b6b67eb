package graft.scoring

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calibration prior blending (reference: scripts/run_scoring_engine.py:47-49,
  * 331-348 and app/scoring_engine/portfolio_priors.py:15-21).
  *
  * blend(x, target, w) = (1−w)·x + w·target.
  * Evidence-dependent weight (TC path): w = clamp(1 − jobs/20, 0.35, 0.95) —
  * more observed evidence → less prior.
  */
object PriorBlend {
  def blend(x: Column, target: Column, w: Column): Column =
    (lit(1.0) - w) * x + w * target

  def evidenceWeight(jobsCount: Column, lo: Double = 0.35, hi: Double = 0.95): Column =
    least(lit(hi), greatest(lit(lo), lit(1.0) - jobsCount.cast("double") / lit(20.0)))
}
